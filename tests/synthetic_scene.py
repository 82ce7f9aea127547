"""Compatibility shim: the procedural scenes moved into the package so
dataset-free CLI/bench/validation flows can use them without sys.path
hacks. Tests keep importing `synthetic_scene`."""

from cednerf_tpu.datasets.procedural import *  # noqa: F401,F403
from cednerf_tpu.datasets.procedural import BallCloudScene, BallScene  # noqa: F401
