from lam_slide_tpu.transport.path import GVPCPlan, ICPlan, VPCPlan
from lam_slide_tpu.transport.transport import (
    ModelType,
    PathType,
    Sampler,
    Transport,
    WeightType,
    create_transport,
)

__all__ = [
    "GVPCPlan",
    "ICPlan",
    "VPCPlan",
    "ModelType",
    "PathType",
    "Sampler",
    "Transport",
    "WeightType",
    "create_transport",
]
