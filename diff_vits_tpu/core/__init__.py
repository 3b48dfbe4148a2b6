from diff_vits_tpu.core.config import Config, load_config
from diff_vits_tpu.core import masking
