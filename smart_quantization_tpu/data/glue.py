"""GLUE data pipeline (all 10 task configs) + IMDB.

Re-design of /root/reference/smart_compress/data/glue.py:17-144 and
imdb.py:17-102: same task registry — text-field map and num_labels for all
ten GLUE configs (glue.py:18-42), float labels for the STSB regression task
(glue.py:113-116), ``validation_matched`` split for MNLI (glue.py:79-81) —
with tokenized batches as padded numpy arrays ready for device upload.

Source of truth: HF ``datasets`` from local cache when present; otherwise a
deterministic synthetic corpus whose labels correlate with planted token
patterns, keeping the full pipeline exercisable offline.
"""

from __future__ import annotations

import numpy as np

from smart_quantization_tpu.data.text import build_tokenizer

TASK_TEXT_FIELDS = {
    "cola": ["sentence"],
    "sst2": ["sentence"],
    "mrpc": ["sentence1", "sentence2"],
    "qqp": ["question1", "question2"],
    "stsb": ["sentence1", "sentence2"],
    "mnli": ["premise", "hypothesis"],
    "qnli": ["question", "sentence"],
    "rte": ["sentence1", "sentence2"],
    "wnli": ["sentence1", "sentence2"],
    "ax": ["premise", "hypothesis"],
}

TASK_NUM_LABELS = {
    "cola": 2,
    "sst2": 2,
    "mrpc": 2,
    "qqp": 2,
    "stsb": 1,
    "mnli": 3,
    "qnli": 2,
    "rte": 2,
    "wnli": 2,
    "ax": 3,
}

_WORDS = (
    "the a of to and in that it is was for on are as with his they at be "
    "this have from or one had by word but not what all were we when your "
    "can said there use an each which she do how their if will up other "
    "about out many then them these so some her would make like him into "
    "time has look two more write go see number no way could people my"
).split()


def _synthetic_examples(task: str, n: int, seed: int):
    """Label-correlated synthetic sentences (offline stand-in)."""
    rng = np.random.RandomState(seed)
    fields = TASK_TEXT_FIELDS[task]
    num_labels = TASK_NUM_LABELS[task]
    markers = ["alpha", "bravo", "charlie"]
    out = []
    for _ in range(n):
        if task == "stsb":
            label = float(rng.uniform(0, 5))
            base = [rng.choice(_WORDS) for _ in range(12)]
            overlap = int(round(label / 5 * 10))
            s2 = base[:overlap] + [rng.choice(_WORDS) for _ in range(12 - overlap)]
            ex = {"sentence1": " ".join(base), "sentence2": " ".join(s2),
                  "label": label}
        else:
            label = int(rng.randint(num_labels))
            words = [rng.choice(_WORDS) for _ in range(14)]
            words[rng.randint(14)] = markers[label % len(markers)]
            ex = {f: " ".join(words) for f in fields}
            ex["label"] = label
        out.append(ex)
    return out


def _load_hf(task: str):
    try:
        import datasets

        ds = datasets.load_dataset(
            "glue", task, download_mode="reuse_cache_if_exists"
        )
        val_key = "validation_matched" if task == "mnli" else "validation"
        return list(ds["train"]), list(ds[val_key])
    except Exception:
        return None


class GLUEData:
    def __init__(
        self,
        task: str = "stsb",
        batch_size: int = 32,
        val_batch_size: int | None = None,
        max_input_length: int = 512,
        tokenizer_name: str = "bert-base-uncased",
        synthetic_train: int = 1024,
        synthetic_val: int = 256,
    ):
        if task not in TASK_TEXT_FIELDS:
            raise ValueError(f"unknown GLUE task {task!r}")
        self.task = task
        self.num_labels = TASK_NUM_LABELS[task]
        self.is_regression = task == "stsb"
        self.batch_size = batch_size
        self.val_batch_size = val_batch_size or max(batch_size // 4, 1)
        self.max_input_length = max_input_length
        self.tokenizer = build_tokenizer(tokenizer_name)
        loaded = _load_hf(task)
        self.synthetic = loaded is None
        if loaded is None:
            loaded = (
                _synthetic_examples(task, synthetic_train, 0),
                _synthetic_examples(task, synthetic_val, 1),
            )
        self.train_examples, self.val_examples = loaded
        self.text_fields = TASK_TEXT_FIELDS[task]

    def _encode(self, examples):
        ids, masks, types, labels = [], [], [], []
        for ex in examples:
            a = ex[self.text_fields[0]]
            b = ex[self.text_fields[1]] if len(self.text_fields) == 2 else None
            i, m, t = self.tokenizer.encode_pair(a, b, self.max_input_length)
            ids.append(i)
            masks.append(m)
            types.append(t)
            labels.append(ex["label"])
        label_dtype = np.float32 if self.is_regression else np.int32
        return dict(
            input_ids=np.asarray(ids, np.int32),
            attention_mask=np.asarray(masks, np.int32),
            token_type_ids=np.asarray(types, np.int32),
            labels=np.asarray(labels, label_dtype),
        )

    def _batches(self, examples, bs, shuffle_seed=None):
        order = np.arange(len(examples))
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)
        for i in range(0, len(order) - bs + 1, bs):
            yield self._encode([examples[j] for j in order[i : i + bs]])

    def train_batches(self, epoch_seed: int):
        # NOTE: the reference leaves train shuffle commented out
        # (glue.py:124); we shuffle, which is the correct behavior.
        yield from self._batches(self.train_examples, self.batch_size, epoch_seed)

    def val_batches(self):
        yield from self._batches(self.val_examples, self.val_batch_size)

    @property
    def steps_per_epoch(self) -> int:
        return len(self.train_examples) // self.batch_size

    @property
    def val_steps_per_epoch(self) -> int:
        return len(self.val_examples) // self.val_batch_size


class IMDBData(GLUEData):
    """IMDB sentiment (reference data/imdb.py:17-102): single text field,
    binary labels."""

    def __init__(self, batch_size: int = 32, val_batch_size: int | None = None,
                 max_input_length: int = 512, **kw):
        self.task = "imdb"
        self.num_labels = 2
        self.is_regression = False
        self.batch_size = batch_size
        self.val_batch_size = val_batch_size or max(batch_size // 4, 1)
        self.max_input_length = max_input_length
        self.tokenizer = build_tokenizer(kw.get("tokenizer_name", "bert-base-uncased"))
        loaded = self._load_imdb()
        self.synthetic = loaded is None
        if loaded is None:
            loaded = (
                _synthetic_examples("sst2", kw.get("synthetic_train", 1024), 2),
                _synthetic_examples("sst2", kw.get("synthetic_val", 256), 3),
            )
            loaded = (
                [{"text": e["sentence"], "label": e["label"]} for e in loaded[0]],
                [{"text": e["sentence"], "label": e["label"]} for e in loaded[1]],
            )
        self.train_examples, self.val_examples = loaded
        self.text_fields = ["text"]

    @staticmethod
    def _load_imdb():
        try:
            import datasets

            ds = datasets.load_dataset("imdb")
            return list(ds["train"]), list(ds["test"])
        except Exception:
            return None
