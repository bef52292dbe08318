"""Vendored tiny tokenizer fixtures so the training/eval entry points run
out of the box with no external assets (the reference pulls real vocab
files from the HF hub at runtime, ref: src/utils/MLS.py:29-32 — no network
here).

  * GPT2 mini: byte-level vocab (ids 0..255 in byte order, eot=256), empty
    merges — a valid byte-level BPE whose ids stay within the real GPT2
    embedding table (50257). NOT id-compatible with the real gpt2 vocab;
    pass real vocab.json/merges.txt via the CLI flags for that.
  * S2T mini: HF Speech2Text special-token layout (<s>/<pad>/</s>/<unk> +
    <lang:xx> codes, so ``lang_code_to_id["fr"]`` works) plus character
    pieces, for transcript decoding without the sentencepiece asset.
"""

from __future__ import annotations

import os

_DIR = os.path.dirname(os.path.abspath(__file__))

GPT2_MINI_VOCAB = os.path.join(_DIR, "gpt2_mini_vocab.json")
GPT2_MINI_MERGES = os.path.join(_DIR, "gpt2_mini_merges.txt")
S2T_MINI_VOCAB = os.path.join(_DIR, "s2t_mini_vocab.json")


def gpt2_mini_tokenizer():
    from ..text.tokenizers import GPT2Tokenizer
    return GPT2Tokenizer(GPT2_MINI_VOCAB, GPT2_MINI_MERGES)


def s2t_mini_tokenizer():
    from ..text.s2t_tokenizer import S2TTokenizer
    return S2TTokenizer.from_file(S2T_MINI_VOCAB)
