"""Shared offline test helpers (no network: tokenizers are built locally)."""

import numpy as np
from PIL import Image


def make_word_tokenizer(extra_words=(), pad="<pad>", eos="</s>", bos="<s>", unk="<unk>"):
    """A tiny whitespace WordLevel tokenizer wrapped as a PreTrainedTokenizerFast —
    standing in for HF AutoTokenizer without any downloads."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    words = [pad, bos, eos, unk] + list(extra_words)
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token=unk))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single=f"{bos} $A {eos}",
        special_tokens=[(bos, vocab[bos]), (eos, vocab[eos])],
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token=pad, eos_token=eos, bos_token=bos, unk_token=unk
    )


def write_jpeg(path, size=32, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return path
