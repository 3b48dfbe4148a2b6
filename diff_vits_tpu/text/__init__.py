from diff_vits_tpu.text.symbols import (
    symbols,
    num_tones,
    num_languages,
    language_id_map,
    language_tone_start_map,
)
from diff_vits_tpu.text.frontend import cleaned_text_to_sequence, clean_text
