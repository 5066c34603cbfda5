"""Dataset adapters: ICL-NUIM and SVO synthetic sequences."""

from mqslam_tpu.datasets import icl_nuim, svo  # noqa: F401
