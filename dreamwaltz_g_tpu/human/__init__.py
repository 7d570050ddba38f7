"""SMPL-X body model, kinematics, poses, conditions, keypoints."""
from .smplx_model import (  # noqa: F401
    SMPLXModelData,
    SMPLXOutput,
    SMPLXParams,
    default_params,
    load_smplx_npz,
    make_synthetic_model,
    smplx_forward,
)
