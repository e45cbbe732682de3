from .block import (C1, C2, C2f, C3, C3Ghost, C3x, IFM, SPP, SPPF, Bottleneck,
                    BottleneckCSP, ConvNeXtV2_Block, DyDCNv2, GRN, GhostBottleneck,
                    HGBlock, HGStem, InjectionMultiSum_Auto_pool, MSPA_C2f, Proto,
                    RepC3, SPRModule, SimFusion_3in, SimFusion_4in, C3TR, dfl_decode)
from .conv import (BN, CBAM, ChannelAttention, Concat, Conv, Conv2, ConvTranspose,
                   DWConv, DWConvTranspose2d,
                   Focus, GhostConv, LightConv, MaxPool2d, RepConv, RepVGGBlock,
                   SpatialAttention, Upsample, ZeroPad2d, autopad, set_default_act)
from .head import (Classify, Conv_GN, Detect, Pose, Segment, TaskDecomposition,
                   TOODHead, decode_detections)

__all__ = [
    "Conv", "DWConv", "LightConv", "ConvTranspose", "Focus", "GhostConv", "RepConv",
    "ChannelAttention", "SpatialAttention", "CBAM", "Concat", "Upsample", "BN",
    "MaxPool2d", "ZeroPad2d", "set_default_act", "RepVGGBlock",
    "autopad", "Bottleneck", "C1", "C2", "C2f", "C3", "C3x", "C3Ghost", "C3TR",
    "Conv2", "DWConvTranspose2d",
    "BottleneckCSP", "RepC3", "GhostBottleneck", "SPP", "SPPF", "HGStem", "HGBlock",
    "Proto", "MSPA_C2f", "SPRModule", "GRN", "ConvNeXtV2_Block", "SimFusion_4in",
    "SimFusion_3in", "IFM", "InjectionMultiSum_Auto_pool", "DyDCNv2", "dfl_decode",
    "Detect", "TOODHead", "Segment", "Pose", "Classify", "Conv_GN",
    "TaskDecomposition", "decode_detections",
]
