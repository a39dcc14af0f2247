"""rpg_svo_tpu — a TPU-native semi-direct visual odometry framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of SVO
(Forster, Pizzoli, Scaramuzza, ICRA 2014; reference C++ at
uzh-rpg/rpg_svo).  All per-feature / per-seed / per-patch math runs as
batched, statically-shaped device programs; the per-frame state machine
stays in host Python.

Layout
------
- ``geometry``  SE3 Lie group, camera models, triangulation, Jacobians
- ``ops``       image ops + batched solvers (pyramid, FAST, sparse image
                alignment, feature alignment, matcher, LK, homography)
- ``core``      data model (frame/map) and the pipeline state machine
- ``parallel``  device-mesh sharded depth filter + bundle adjustment
- ``io``        dataset readers, trajectory / trace writers
- ``analysis``  ATE / RPE evaluation, timing analysis
- ``utils``     synthetic dataset renderer, misc helpers
"""

__version__ = "0.1.0"

from rpg_svo_tpu.config import Config  # noqa: F401
