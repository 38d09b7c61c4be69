"""Python UDTFs — the table-function corner of the extension surface.

This engine's rule for Python (SURVEY §2.11, SCALE.md): built-in
expressions first, Arrow-batched pandas operators when Python is
genuinely needed. UDTFs complete that matrix for ONE shape the
others don't cover: per-row fan-out of VARIABLE length driven by
imperative logic (state machines, recursive-descent parsing) that
higher-order functions can't express and grouped-map doesn't fit
(no group, just row → N rows).

``split_sentences`` is the tested template: regex-with-lookbehind
sentence segmentation (Java regex in ``split()`` has no variable
lookbehind; Python ``re`` does). Row-at-a-time Python IS the slow
path — use it for the long tail, never for a hot full-corpus pass;
the registry's chunking/shingling queries show the built-in
alternatives for fixed-stride fan-out.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string, n_words: int")
class split_sentences:
    """doc text → one row per sentence with a word count.

    Sentence boundary: ., ! or ? followed by whitespace and an
    upper-case letter — the lookahead keeps abbreviations like
    "e.g. x" glued when followed by lower case.
    """

    _BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z])")

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if not text:
            return
        for i, sent in enumerate(self._BOUNDARY.split(text.strip())):
            s = sent.strip()
            if s:
                yield i, s, len(s.split())
