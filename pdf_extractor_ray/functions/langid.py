"""Language identification: character n-gram profile heuristic.

An n-gram profile classifier in the Cavnar & Trenkle family, simplified to
OVERLAP COUNT scoring: a document is scored by how many of its ``top_k``
most frequent trigrams appear in each language's profile set (the full C&T
rank-distance is not used — membership is enough at these profile sizes).
Deterministic, dependency-free, and cheap — intended as the actor-pool
stage's once-per-worker state (profiles built in ``__init__``).
"""

from __future__ import annotations

from collections import Counter

# Minimal built-in profiles: most-frequent trigrams of each language
# (space-padded, from public frequency tables). Good enough for coarse
# routing; swap in bigger profiles via LangId(profiles=...).
DEFAULT_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", "ed ", " in", "er ", "es ", " co", "at ", "on ", "in "],
    "de": ["en ", "er ", " de", "der", "ie ", " di", "die", "sch", "ein", "che",
           "ich", "nde", " un", "und", "nd ", " ei", "ch ", "ung", "gen", " ge"],
    "fr": [" de", "de ", " le", "es ", "le ", "ent", "nt ", "et ", " et", "la ",
           " la", "ion", "on ", "re ", " pa", "e d", "ne ", "ur ", " qu", "que"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ue ", "en ", " en",
           "ent", " qu", "que", "nte", "as ", "ón ", "ció", "es ", " co", "ar "],
    "zh": [],  # CJK: routed by script detection, not trigrams
}


class LangId:
    """Callable usable directly or as a map_batches actor class."""

    def __init__(self, profiles: dict[str, list[str]] | None = None, top_k: int = 40):
        profiles = profiles or DEFAULT_PROFILES
        self.top_k = top_k
        # membership sets — scoring is overlap count (see module docstring)
        self.profiles = {
            lang: frozenset(grams) for lang, grams in profiles.items() if grams
        }

    @staticmethod
    def _is_cjk(text: str) -> bool:
        cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
        return cjk > 10

    def predict(self, text: str) -> str:
        # NaN/None survive pandas object columns — must route to "und", not
        # crash the CJK subscript
        if not isinstance(text, str) or not text:
            return "und"
        if self._is_cjk(text):
            return "zh"
        padded = f" {text.lower()} "
        grams = Counter(padded[i : i + 3] for i in range(len(padded) - 2))
        doc_top = [g for g, _ in grams.most_common(self.top_k)]
        best_lang, best_score = "und", 0
        for lang, profile in self.profiles.items():
            score = sum(1 for g in doc_top if g in profile)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch):
        """Arrow batch in/out (map_batches actor usage). The per-row
        ``predict`` is inherent to the model (Counter over trigrams), but
        the batch stays zero-copy Arrow around it — no pandas round-trip."""
        import pyarrow as pa

        preds = [self.predict(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
