from .balle17 import Analysis17, Synthesis17, Balle17Compressor
from .transforms18 import (
    Analysis18,
    Synthesis18,
    AnalysisPrior,
    SynthesisPrior,
)
from .hyperprior import ScaleHyperprior
from .cheng2020 import (
    ChengAnalysis,
    ChengHyperAnalysis,
    ChengHyperSynthesis,
    ChengSynthesis,
    JointAutoregressive,
)
from .dsc import DSCConfig, DSCDecoder, DSCStereoModel, DSC_PRESETS
from .attention import bottleneck_attention, PatchMatchAttention, NLBlock
from .passr import PAM, PASSRnet, ResASPPB, ResB, passr_losses
from .enhance import FIF, FIFEnhance, FinalEnhanceNet, ConvBlock, AdaptiveBatchNorm
from .extra import (
    ImageCompressorFC,
    LatentCompressor,
    AnalysisSmall,
    SynthesisSmall,
)

__all__ = [
    "bottleneck_attention",
    "PatchMatchAttention",
    "NLBlock",
    "PAM",
    "PASSRnet",
    "ResASPPB",
    "ResB",
    "passr_losses",
    "FIF",
    "FIFEnhance",
    "FinalEnhanceNet",
    "ConvBlock",
    "AdaptiveBatchNorm",
    "ImageCompressorFC",
    "LatentCompressor",
    "AnalysisSmall",
    "SynthesisSmall",
    "Analysis17",
    "Synthesis17",
    "Balle17Compressor",
    "Analysis18",
    "Synthesis18",
    "AnalysisPrior",
    "SynthesisPrior",
    "ScaleHyperprior",
    "ChengAnalysis",
    "ChengHyperAnalysis",
    "ChengHyperSynthesis",
    "ChengSynthesis",
    "JointAutoregressive",
    "DSCConfig",
    "DSCDecoder",
    "DSCStereoModel",
    "DSC_PRESETS",
]
