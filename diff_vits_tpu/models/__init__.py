from diff_vits_tpu.models.encoders import (
    TextEncoder,
    PosteriorEncoder,
    PromptEncoder,
    ReferenceEncoder,
)
from diff_vits_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
    DurationPredictorUNet,
)
from diff_vits_tpu.models.flow import ResidualCouplingBlock, TransformerCouplingBlock
from diff_vits_tpu.models.vits import VITS
from diff_vits_tpu.models.diffusion_encoder import DiffusionEncoder
from diff_vits_tpu.models.diff_vits import DiffVits
