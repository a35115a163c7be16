"""Reference-compatible import surface.

Lets code written against ChuWeiEr/GravInv3DHMC's flat module layout run on
this framework with only the import root changed:

    # reference                      # here
    import utils, mesher             from gravinv3dhmc_tpu.compat import utils, mesher
    from gravmag import prism        from gravinv3dhmc_tpu.compat.gravmag import prism
    from inversion import hmc        from gravinv3dhmc_tpu.compat.inversion import hmc

Every name resolves to the TPU-native implementation; numerical semantics
and file formats match the reference (see module docstrings for the
documented divergences).
"""
from .. import constants, mesher, utils  # noqa: F401
from . import gravmag, inversion, vis  # noqa: F401
