"""Speech2Text (S2T) transcript decoding — pure Python, no sentencepiece.

Behavioral spec: HF ``Speech2TextTokenizer`` as the reference uses it for
ASR transcripts (ref: src/model/Speech2Text.py:19-21 ``processor.batch_decode``
and :11 ``forced_bos_token_id=tokenizer.lang_code_to_id['fr']``).

Decoding a SentencePiece *unigram* model needs only the id->piece table:
``sp_model.decode(pieces)`` concatenates pieces and maps the word-boundary
marker ``▁`` to a space (no byte-fallback in s2t-medium-mustc). The spm
binary is required only for ENCODING, which the eval path never does. So:

  * ``S2TTokenizer(vocab)``        — id->piece decode + special filtering,
    mirroring Speech2TextTokenizer.convert_tokens_to_string semantics
  * ``lang_code_to_id``            — ``<lang:xx>`` lookup (the reference's
    forced French BOS); with a real vocab.json this reproduces the model's
    lang ids instead of a hardcoded constant
  * ``S2TTokenizer.from_file(p)``  — load a vendored/downloaded vocab.json
  * ``S2TTokenizer.placeholder(n)``— structurally valid stand-in vocab for
    environments without the asset (this one): decode still produces
    text-shaped hypotheses so CER/WER is text-vs-text, but the mapping is
    NOT the trained model's — swap in the real vocab.json for real numbers.
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence

SPIECE_UNDERLINE = "▁"
MUSTC_LANGS = ("pt", "fr", "ru", "nl", "ro", "it", "es", "de")


class S2TTokenizer:
    def __init__(self, vocab: Dict[str, int], *, do_upper_case: bool = False,
                 langs: Sequence[str] = MUSTC_LANGS):
        self.vocab = dict(vocab)
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self.do_upper_case = do_upper_case
        self.special_tokens = {"<s>", "<pad>", "</s>", "<unk>"} | {
            f"<lang:{l}>" for l in langs}
        self.eos_token_id = self.vocab.get("</s>", 2)
        self.pad_token_id = self.vocab.get("<pad>", 1)
        self.lang_code_to_id = {
            l: self.vocab[f"<lang:{l}>"] for l in langs
            if f"<lang:{l}>" in self.vocab}

    @classmethod
    def from_file(cls, vocab_json_path: str, **kw) -> "S2TTokenizer":
        with open(vocab_json_path) as f:
            return cls(json.load(f), **kw)

    @classmethod
    def placeholder(cls, vocab_size: int = 10000,
                    langs: Sequence[str] = MUSTC_LANGS) -> "S2TTokenizer":
        """Deterministic stand-in vocab with HF S2T's special layout
        (<s>=0 <pad>=1 </s>=2 <unk>=3, lang codes next); remaining ids
        become synthetic word pieces."""
        vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
        for i, l in enumerate(langs):
            vocab[f"<lang:{l}>"] = 4 + i
        base = 4 + len(langs)
        for i in range(base, vocab_size):
            vocab[f"{SPIECE_UNDERLINE}tok{i}"] = i
        return cls(vocab, langs=langs)

    # ------------------------------------------------------------------

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        """Mirror of Speech2TextTokenizer.convert_tokens_to_string with the
        pure-Python piece decode (join + ▁->space + strip)."""
        def sp_decode(pieces: List[str]) -> str:
            return "".join(pieces).replace(SPIECE_UNDERLINE, " ").strip()

        out, current = "", []
        for token in tokens:
            if token in self.special_tokens:
                decoded = sp_decode(current)
                out += (decoded.upper() if self.do_upper_case
                        else decoded) + token + " "
                current = []
            else:
                current.append(token)
        decoded = sp_decode(current)
        out += decoded.upper() if self.do_upper_case else decoded
        return out.strip()

    def decode(self, ids: Sequence[int], *,
               skip_special_tokens: bool = True) -> str:
        ids = [int(i) for i in ids]
        # generated sequences START with the decoder-start token, which for
        # S2T is </s> (HF Speech2TextConfig.decoder_start_token_id == eos);
        # drop it before the stop-at-first-EOS truncation or every decode
        # would truncate to the empty string
        if ids and ids[0] == self.eos_token_id:
            ids = ids[1:]
        if self.eos_token_id in ids:  # stop at the first EOS like generate()
            ids = ids[:ids.index(self.eos_token_id) + 1]
        tokens = [self.id_to_token.get(i, "<unk>") for i in ids]
        if skip_special_tokens:
            tokens = [t for t in tokens if t not in self.special_tokens]
        return self.convert_tokens_to_string(tokens)

    def batch_decode(self, batch_ids, **kw) -> List[str]:
        return [self.decode(ids, **kw) for ids in batch_ids]
