"""Tokenization for the text pipelines.

Uses a locally-cached HF BERT tokenizer when available; otherwise a
deterministic hash tokenizer with BERT's special-token conventions so GLUE /
IMDB pipelines stay runnable in a zero-network environment (the accuracy
numbers of the hash fallback are obviously not comparable to WordPiece).
"""

from __future__ import annotations

PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 100, 101, 102
DEFAULT_VOCAB = 30522


class HashTokenizer:
    """Deterministic word-hash tokenizer (offline fallback)."""

    vocab_size = DEFAULT_VOCAB

    def encode_pair(self, a: str, b: str | None, max_len: int):
        import hashlib

        def words_to_ids(text):
            ids = []
            for w in text.lower().split():
                h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                ids.append(1000 + h % (self.vocab_size - 1000))
            return ids

        ids = [CLS_ID] + words_to_ids(a) + [SEP_ID]
        types = [0] * len(ids)
        if b is not None:
            more = words_to_ids(b) + [SEP_ID]
            ids += more
            types += [1] * len(more)
        ids = ids[:max_len]
        types = types[:max_len]
        mask = [1] * len(ids)
        pad = max_len - len(ids)
        return (
            ids + [PAD_ID] * pad,
            mask + [0] * pad,
            types + [0] * pad,
        )


class HFTokenizer:
    def __init__(self, name: str = "bert-base-uncased"):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(name, local_files_only=True)
        self.vocab_size = self.tok.vocab_size

    def encode_pair(self, a: str, b: str | None, max_len: int):
        out = self.tok(
            a,
            b,
            max_length=max_len,
            padding="max_length",
            truncation="longest_first",
        )
        return (
            out["input_ids"],
            out["attention_mask"],
            out.get("token_type_ids", [0] * max_len),
        )


def build_tokenizer(name: str = "bert-base-uncased"):
    try:
        return HFTokenizer(name)
    except Exception:
        return HashTokenizer()
