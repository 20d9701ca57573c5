"""The seven optical-flow model families, TPU-native."""

from .flownet2 import (
    FlowNet2,
    FlowNet2CS,
    FlowNet2CSub,
    FlowNet2Single,
    FlowNet2SSub,
    FlowNetFusion,
    FlowNetS2,
    FlowNetSD,
)
from .flownet_family import FlowNetC, FlowNetCFlex, FlowNetS
from .pwcnet import PWCNet
from .raft_model import RAFT
from .registry import (
    FlowModel,
    fetch_model,
    get_flownet_choices,
    load_checkpoint_variables,
    predict_flow,
)
from .spynet import SpyNet

__all__ = [
    "FlowModel",
    "FlowNet2",
    "FlowNet2CS",
    "FlowNet2CSub",
    "FlowNet2Single",
    "FlowNet2SSub",
    "FlowNetC",
    "FlowNetCFlex",
    "FlowNetFusion",
    "FlowNetS",
    "FlowNetS2",
    "FlowNetSD",
    "PWCNet",
    "RAFT",
    "SpyNet",
    "fetch_model",
    "get_flownet_choices",
    "load_checkpoint_variables",
    "predict_flow",
]
