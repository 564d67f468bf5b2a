"""Assemble the vendored calibration corpus from locally-available real text.

The reference bundles a weighted real-corpus mix (standard_cal_data/: c4,
code, multilingual, technical, wiki, tiny — calibration_data.py:61-99). This
environment has no network egress, so this script builds an equivalent small
mix from text already present on the machine, all of it REAL (not generated):

  english.utf8      natural English prose — PyPI long-descriptions (README
                    text embedded in installed *.dist-info/METADATA)
  code.utf8         Python source — a sample of CPython stdlib modules (PSF)
  technical.utf8    technical English — pydoc-rendered stdlib documentation
  multilingual.utf8 CJK + non-ASCII text from installed language data
  tiny.utf8         a short plain-English seed (original, committed as text)

Output goes to exllamav3_tpu/conversion/cal_data/ and is committed, so
conversions are reproducible without rerunning this script. Re-run only to
refresh: `python tools/build_cal_data.py`.
"""
from __future__ import annotations

import glob
import io
import os
import re
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "exllamav3_tpu", "conversion", "cal_data")

SITE = None
for p in sys.path:
    if p.endswith("site-packages") and os.path.isdir(p):
        SITE = p
        break


def build_english(limit=400_000) -> str:
    """PyPI long-description prose from installed package metadata: real
    English written by many different authors (project docs)."""
    parts = []
    total = 0
    metas = sorted(glob.glob(os.path.join(SITE, "*.dist-info", "METADATA")),
                   key=os.path.getsize, reverse=True)
    for m in metas:
        try:
            with open(m, errors="ignore") as f:
                raw = f.read()
        except OSError:
            continue
        # body = after the first blank line (email-style header ends there)
        body = raw.split("\n\n", 1)
        if len(body) < 2:
            continue
        text = body[1]
        # drop markup-heavy lines: badges, links, tables, html
        lines = []
        for ln in text.splitlines():
            if re.search(r"https?://|\|\s*\||^\s*[<\[!#=~\-\+`]|::|\.\. ", ln):
                continue
            lines.append(ln)
        text = re.sub(r"\n{3,}", "\n\n", "\n".join(lines)).strip()
        # keep only files that are mostly prose (words with spaces)
        if len(text) < 2000:
            continue
        parts.append(text)
        total += len(text)
        if total > limit:
            break
    return "\n\n".join(parts)


STDLIB_MODULES = [
    "argparse", "asyncio/base_events", "collections/__init__", "dataclasses",
    "difflib", "email/message", "functools", "http/client", "inspect",
    "ipaddress", "json/encoder", "logging/__init__", "pathlib", "pickle",
    "selectors", "statistics", "tarfile", "textwrap", "threading", "typing",
]


def build_code(limit=400_000) -> str:
    """CPython stdlib source (PSF license): real, diverse Python code."""
    import sysconfig

    stdlib = sysconfig.get_paths()["stdlib"]
    parts = []
    total = 0
    for mod in STDLIB_MODULES:
        p = os.path.join(stdlib, mod + ".py")
        if not os.path.exists(p):
            continue
        with open(p, errors="ignore") as f:
            src = f.read()
        parts.append(src[: limit // len(STDLIB_MODULES) * 2])
        total += len(parts[-1])
        if total > limit:
            break
    return "\n\n".join(parts)


PYDOC_MODULES = ["os", "re", "socket", "subprocess", "itertools", "math",
                 "sqlite3", "struct", "datetime", "random"]


def build_technical(limit=250_000) -> str:
    """pydoc-rendered stdlib documentation: dense technical English."""
    import pydoc

    parts = []
    total = 0
    for name in PYDOC_MODULES:
        try:
            mod = __import__(name)
            text = pydoc.render_doc(mod, renderer=pydoc.plaintext)
        except Exception:
            continue
        parts.append(text[: limit // len(PYDOC_MODULES) * 2])
        total += len(parts[-1])
        if total > limit:
            break
    return "\n\n".join(parts)


def build_multilingual(limit=150_000) -> str:
    """Real non-English text available offline: CJK vocabulary with
    frequencies (jieba's dictionary — GPL-licensed language data) arranged
    as running text, plus any non-ASCII prose from package metadata."""
    parts = []
    dict_p = os.path.join(SITE, "jieba", "dict.txt")
    if os.path.exists(dict_p):
        words = []
        with open(dict_p, errors="ignore") as f:
            for i, ln in enumerate(f):
                if i % 37:  # sample across the frequency range
                    continue
                w = ln.split()[0] if ln.split() else ""
                if w:
                    words.append(w)
                if len(words) > 30000:
                    break
        # join into lines of ~40 words (running-text shape for tokenizers)
        lines = ["".join(words[i : i + 40]) for i in range(0, len(words), 40)]
        parts.append("\n".join(lines)[: limit * 3 // 4])
    # non-ASCII prose from metadata (author names, docs in other languages)
    buf = io.StringIO()
    for m in glob.glob(os.path.join(SITE, "*.dist-info", "METADATA")):
        try:
            with open(m, errors="ignore") as f:
                for ln in f:
                    if sum(ord(c) > 127 for c in ln) > len(ln) * 0.2:
                        buf.write(ln)
        except OSError:
            continue
        if buf.tell() > limit // 4:
            break
    parts.append(buf.getvalue())
    return "\n".join(parts)


TINY = """\
The sun rose over the hills and the town began to wake. A baker lit his
ovens before dawn and the smell of bread drifted down the narrow street.
Children walked to school in small groups, kicking stones and trading
riddles. By noon the market was full: fruit sellers called out prices,
a fiddler played near the fountain, and two old friends argued happily
about the weather. When evening came the lamps were lit one by one, and
the river carried the last light of the day out past the mill and into
the quiet fields beyond. Nothing remarkable happened, and that was the
point: it was an ordinary day, measured in small kindnesses and the slow
steady work of people who knew their trade. Tomorrow would be much the
same, and no one in the town would have wished it otherwise.
"""


def main():
    os.makedirs(OUT, exist_ok=True)
    files = {
        "english.utf8": build_english(),
        "code.utf8": build_code(),
        "technical.utf8": build_technical(),
        "multilingual.utf8": build_multilingual(),
        "tiny.utf8": TINY,
    }
    for name, text in files.items():
        p = os.path.join(OUT, name)
        with open(p, "w") as f:
            f.write(text)
        print(f"{name}: {len(text):,} chars")


if __name__ == "__main__":
    main()
