from sesameai_tts_tpu.tokenizer.text import (
    TextTokenizer,
    ByteTokenizer,
    HFTokenizer,
    load_text_tokenizer,
)
