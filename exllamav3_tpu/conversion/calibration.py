"""Calibration data for quantization.

Feature reference: /root/reference/exllamav3/conversion/calibration_data.py
(bundled corpus mix: c4/code/multilingual/technical/wiki/tiny + random rows
with weights 20/20/10/10/50/5/20). Three tiers, best available wins:

  * `text_files` accepts a WEIGHTED mix — entries are paths or
    "path:weight" strings (or (path, weight) tuples); rows are drawn from
    each source proportionally, at random offsets (the reference samples
    rows, it does not chunk sequentially).
  * without files, a VENDORED real-text mix (cal_data/: English prose,
    Python source, technical documentation, CJK text, tiny seed — built
    offline by tools/build_cal_data.py from redistributable local text) is
    used whenever a tokenizer is available, with weights mirroring the
    reference's category ratios, plus the reference's share of random rows.
  * without a tokenizer (purely synthetic models), rows synthesize a mixed
    distribution from several generators that exercise different Hessian
    structures the way the corpus categories do: zipfian draws (natural-
    frequency text), uniform random, low-entropy repetitive spans
    (code-like), and repeated short motifs (tiny-corpus-like).
"""
from __future__ import annotations

import os

import numpy as np

_CAL_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "cal_data")
# mirrors the reference's weights with english covering c4+wiki (20+50),
# random rows keep their 20 share via the synthetic fill below
_BUNDLED_MIX = (("english.utf8", 70.0), ("code.utf8", 20.0),
                ("technical.utf8", 10.0), ("multilingual.utf8", 10.0),
                ("tiny.utf8", 5.0))
_RANDOM_SHARE = 20.0 / (70 + 20 + 10 + 10 + 5 + 20)


def bundled_text_files() -> list | None:
    """The vendored real-text mix as (path, weight) entries, or None when
    the data files are absent (EXL3TPU_NO_CAL_DATA=1 also disables)."""
    if os.environ.get("EXL3TPU_NO_CAL_DATA"):
        return None
    out = [(os.path.join(_CAL_DATA_DIR, name), w)
           for name, w in _BUNDLED_MIX
           if os.path.exists(os.path.join(_CAL_DATA_DIR, name))]
    return out or None


def _parse_sources(text_files) -> list:
    out = []
    for entry in text_files or []:
        if isinstance(entry, (tuple, list)):
            out.append((str(entry[0]), float(entry[1])))
        elif isinstance(entry, str) and ":" in entry \
                and os.path.exists(entry.rsplit(":", 1)[0]) \
                and entry.rsplit(":", 1)[1].replace(".", "").isdigit():
            path, w = entry.rsplit(":", 1)
            out.append((path, float(w)))
        else:
            out.append((str(entry), 1.0))
    return out


def _synth_row(rng, kind: int, length: int, v: int) -> np.ndarray:
    if kind == 0:      # uniform random (reference random rows)
        return rng.integers(0, v, size=length)
    if kind == 1:      # code-like: small alphabet, heavy local repetition
        alphabet = rng.integers(0, v, size=max(32, v // 64))
        idx = rng.zipf(1.5, size=length * 2) - 1
        idx = idx[idx < alphabet.size][:length]
        while idx.size < length:
            idx = np.concatenate([idx, rng.integers(0, alphabet.size,
                                                    size=length - idx.size)])
        return alphabet[idx[:length]]
    if kind == 2:      # tiny-corpus-like: repeated short motifs
        motif = rng.integers(0, v, size=int(rng.integers(16, 64)))
        reps = int(np.ceil(length / motif.size))
        return np.tile(motif, reps)[:length]
    # natural-frequency text: zipfian draws
    r = rng.zipf(1.3, size=length * 2)
    r = r[r < v][:length]
    while r.size < length:
        r = np.concatenate([r, rng.integers(0, v, size=length - r.size)])
    return r[:length]


# synthetic mix weights: natural 50, code-like 20, random 20, tiny 10
_SYNTH_MIX = [3, 3, 0, 1, 3, 2, 0, 3, 1, 2]


def get_calibration(
    tokenizer=None,
    rows: int = 100,
    length: int = 2048,
    text_files: list | None = None,
    vocab_size: int | None = None,
    seed: int = 0,
    add_bos: bool = True,
) -> np.ndarray:
    """Returns (rows, length) int64 token ids."""
    rng = np.random.default_rng(seed)
    chunks: list[np.ndarray] = []

    rows_from_text = rows
    if text_files is None and tokenizer is not None:
        # prefer the vendored real-text mix; keep the reference's random-row
        # share as synthetic fill (calibration_data.py random rows)
        text_files = bundled_text_files()
        if text_files is not None:
            rows_from_text = rows - int(round(rows * _RANDOM_SHARE))

    sources = _parse_sources(text_files)
    if sources:
        total_w = sum(w for _, w in sources)
        toks = []
        for path, w in sources:
            with open(path, "r", errors="ignore") as f:
                text = f.read()
            ids = np.asarray(tokenizer.encode(text)).reshape(-1)
            toks.append((ids, w))
        for ids, w in toks:
            n = max(1, int(round(rows_from_text * w / total_w)))
            if ids.size <= length:
                reps = int(np.ceil((length + 1) / ids.size))
                ids = np.tile(ids, reps)
            for _ in range(n):
                off = int(rng.integers(0, max(ids.size - length, 1)))
                chunks.append(ids[off : off + length])
        rng.shuffle(chunks)

    need = rows - len(chunks)
    if need > 0:
        v = vocab_size or (tokenizer.vocab_size if tokenizer else 32000)
        for i in range(need):
            kind = _SYNTH_MIX[i % len(_SYNTH_MIX)]
            chunks.append(_synth_row(rng, kind, length, v))

    out = np.stack(chunks[:rows]).astype(np.int64)
    if add_bos and tokenizer is not None \
            and getattr(tokenizer, "bos_token_id", None) is not None:
        out[:, 0] = tokenizer.bos_token_id
    return out
