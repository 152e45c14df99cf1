"""CSoundex — Chinese Soundex phonetic encoding + similarity.

From-formula reimplementation of the reference's phonetic model
(/root/reference/src/ir/text/csoundex.py:232-533; bucket definitions
from configs/csoundex.yaml; lexicon data vendored from
datasets/lexicon/basic_pinyin.tsv — character->pinyin linguistic data):

- code per Chinese char: ``[pinyin first letter][initial group 0-9]
  [final group 0-9]`` (+ tone digit when requested), e.g. 張 (zhang1)
  -> ``Z89``; ASCII letters encode as their uppercase letter;
  digits/punctuation are skipped.
- pinyin split: longest-initial-first parse with the y/w/yu special
  cases (yi->i, wu->u, yu->v...).
- fuzzy similarity: positional code matches / max(len) (csoundex.py:
  448-465); weighted mode uses 1/(i+1) position weights; exact mode is
  whole-code equality.
- ``find_similar``: brute-force scan with threshold 0.72 / top-8 as
  the app's query expansion uses it (search_service.py:397-411).  The
  distributed scale path is ``code_key`` bucketing: terms sharing a
  code-sequence bucket are exact phonetic matches, so a groupby on the
  key finds homophone classes without the O(V) scan.

pypinyin is not available in this environment (and the reference
itself supports dictionary-only mode); characters outside the lexicon
fall back to their raw form, as the reference does.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "basic_pinyin.tsv")

# Bucket definitions transcribed from configs/csoundex.yaml (articulation
# classes: bilabial / labiodental / nasal / alveolar / velar / palatal /
# retroflex / dental sibilant).
_INITIAL_GROUPS = {
    1: ("b", "p"), 2: ("f",), 3: ("m",), 4: ("d", "t"), 5: ("n", "l"),
    6: ("g", "k", "h"), 7: ("j", "q", "x"), 8: ("zh", "ch", "sh", "r"),
    9: ("z", "c", "s"),
}
_FINAL_GROUPS = {
    1: ("a", "ia", "ua"), 2: ("o", "uo"), 3: ("e", "ie", "ue", "ve"),
    4: ("i",), 5: ("u",), 6: ("v", "u:"),
    7: ("ai", "ei", "ui", "uai"), 8: ("ao", "ou", "iu", "iao"),
    9: ("an", "en", "in", "un", "vn", "ang", "eng", "ing", "ong",
        "ian", "uan", "van", "iang", "uang", "iong", "er"),
}
_INITIAL_TO_CODE = {p: c for c, ps in _INITIAL_GROUPS.items() for p in ps}
_FINAL_TO_CODE = {p: c for c, ps in _FINAL_GROUPS.items() for p in ps}

# longest-first so "zh" parses before "z" (csoundex.py:284-285)
_INITIALS = ("zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l",
             "g", "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w")

_TONE_RE = re.compile(r"(\d)$")


@lru_cache(maxsize=1)
def _lexicon() -> dict[str, str]:
    lex: dict[str, str] = {}
    with open(_DATA, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) >= 2 and parts[0] not in lex:
                lex[parts[0]] = parts[1].strip().lower()
    return lex


def _is_chinese(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def split_initial_final(py: str) -> tuple[str, str]:
    """Initial/final split with the y/w/yu cases (csoundex.py:270-303)."""
    for init in _INITIALS:
        if py.startswith(init):
            final = py[len(init):]
            if init == "y" and final in ("i", ""):
                return "", "i"
            if init == "w" and final in ("u", ""):
                return "", "u"
            if init == "y" and final.startswith("u"):
                return "", "v" + final[1:]
            return init, final if final else py
    return "", py


def normalize_pinyin(py: str) -> tuple[str, str, str]:
    """(initial, final, tone) from TONE3 pinyin (csoundex.py:232-268)."""
    py = py.lower().strip()
    m = _TONE_RE.search(py)
    if m:
        tone = m.group(1)
        py = py[:-1]
    else:
        tone = "0"
    initial, final = split_initial_final(py)
    return initial, final, tone


@lru_cache(maxsize=1 << 16)
def encode_character(char: str, include_tone: bool = False) -> str:
    """One char -> CSoundex code (csoundex.py:306-363)."""
    if not _is_chinese(char):
        return char.upper() if char.isalpha() else ""
    py = _lexicon().get(char)
    if not py:
        return char  # dictionary-only fallback, as the reference
    initial, final, tone = normalize_pinyin(py)
    first = py[0].upper()
    icode = _INITIAL_TO_CODE.get(initial, 0)
    fcode = _FINAL_TO_CODE.get(final, 0)
    return f"{first}{icode}{fcode}{tone}" if include_tone else f"{first}{icode}{fcode}"


def encode(text: str, include_tone: bool = False) -> str:
    """Text -> space-joined per-char codes (punct/digits skipped)."""
    return " ".join(c for c in (encode_character(ch, include_tone) for ch in text) if c)


def similarity(text1: str, text2: str, mode: str = "fuzzy") -> float:
    """Phonetic similarity in [0, 1] (csoundex.py:420-493)."""
    code1 = encode(text1, include_tone=False)
    code2 = encode(text2, include_tone=False)
    if mode == "exact":
        return 1.0 if code1 == code2 else 0.0
    codes1, codes2 = code1.split(), code2.split()
    if not codes1 or not codes2:
        return 0.0
    if mode == "fuzzy":
        matches = sum(1 for a, b in zip(codes1, codes2) if a == b)
        return matches / max(len(codes1), len(codes2))
    if mode == "weighted":
        total = matched = 0.0
        for i, (a, b) in enumerate(zip(codes1, codes2)):
            w = 1.0 / (i + 1)
            total += w
            if a == b:
                matched += w
        for i in range(min(len(codes1), len(codes2)), max(len(codes1), len(codes2))):
            total += 1.0 / (i + 1)
        return matched / total if total > 0 else 0.0
    raise ValueError(f"unknown similarity mode: {mode}")


def find_similar(query: str, candidates: list[str], threshold: float = 0.6,
                 topk: int | None = None) -> list[tuple[str, float]]:
    """Candidates with fuzzy similarity >= threshold, score desc (the
    app calls this with threshold=0.72, topk=8 — search_service.py:
    397-411).  Ties break by candidate asc for determinism (the
    reference's sort leaves ties unspecified)."""
    results = [(c, similarity(query, c, "fuzzy")) for c in candidates]
    results = [(c, s) for c, s in results if s >= threshold]
    results.sort(key=lambda x: (-x[1], x[0]))
    return results[:topk] if topk is not None else results


def code_key(text: str) -> str:
    """Whole-text phonetic bucket key (code sequence, no spaces) — the
    distributed grouping key: exact phonetic matches share the key, so
    homophone classes come out of one groupby instead of an O(V) scan."""
    return encode(text, include_tone=False).replace(" ", "")
