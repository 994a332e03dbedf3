from audio_rag_tpu.text.tokenizer import (
    HashWordTokenizer,
    Tokenizer,
    get_tokenizer,
)

__all__ = ["Tokenizer", "HashWordTokenizer", "get_tokenizer"]
