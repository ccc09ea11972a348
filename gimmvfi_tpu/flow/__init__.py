from .raft import RAFT
from .flowformer import FlowFormer
from .twins import TwinsSVTLarge2Stage
