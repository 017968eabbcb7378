"""Tiny stopword-based language detection.

Replaces the reference's ``langdetect`` dependency
(/root/reference/src/raglite/_search.py:374-385), which only feeds
per-language reranker selection.  Counting high-frequency function words is
accurate enough for that routing decision.
"""

from __future__ import annotations

import re

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are", "this", "which"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "eine", "zu", "den", "auf"},
    "fr": {"le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour", "qui", "pas", "sur"},
    "es": {"el", "la", "los", "las", "es", "una", "que", "para", "por", "con", "del", "se"},
    "nl": {"de", "het", "een", "en", "van", "dat", "niet", "voor", "met", "aan", "zijn", "ook"},
    "it": {"il", "la", "che", "di", "non", "una", "per", "sono", "del", "gli", "nel"},
    "pt": {"o", "a", "os", "as", "que", "uma", "para", "com", "não", "dos", "mais"},
}

# Latin letters incl. the sharp s (U+00DF) but NOT the division sign
# (U+00F7) — [à-ÿ] splits 'weiß' and joins '÷'.
_WORD_RE = re.compile(r"[a-zß-öø-ÿ]+")


def detect_language(text: str) -> str:
    """Best-matching language code, or "other" when nothing matches."""
    words = _WORD_RE.findall(text.lower())[:400]
    if not words:
        return "other"
    best_lang, best_hits = "other", 0
    for lang, stopwords in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stopwords)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits < max(2, len(words) // 50):
        return "other"
    return best_lang
