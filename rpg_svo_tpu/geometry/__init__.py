from rpg_svo_tpu.geometry.se3 import SE3  # noqa: F401
from rpg_svo_tpu.geometry.cameras import (  # noqa: F401
    PinholeCamera, ATANCamera,
)
