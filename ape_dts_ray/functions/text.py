"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` bodies over the ``documents`` table
(doc_id, text, ...). Stateful pieces (compiled regexes, stopword tables) live
in callable classes — actor pools amortize setup per actor, per the Ray Data
stateful-stage idiom. Nothing here loops over Python rows in the hot path
except where a per-document reduction is inherently scalar (then it runs over
numpy arrays inside the batch, still one C-level pass per document).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# --- language ID (n-gram / stopword heuristic) ---

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with", "as", "have", "be", "at", "or"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "se", "no", "con", "por", "para", "es", "al", "lo", "como", "del"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
           "eine", "als"},
    "fr": {"le", "la", "les", "de", "des", "un", "une", "et", "en", "du",
           "dans", "est", "que", "qui", "pour", "pas", "sur", "au", "avec",
           "ne"},
}


def _flatten_words(texts, word_re) -> tuple[pd.Series, np.ndarray]:
    """All regex words of a batch as one flat Series + per-doc counts —
    the per-doc regex scan is inherent (C-level per document), but every
    downstream membership test then runs vectorized over the flat array."""
    lists = [word_re.findall((t or "").lower()) for t in texts]
    counts = np.fromiter((len(w) for w in lists), dtype=np.int64,
                         count=len(lists))
    total = int(counts.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in lists:
        flat[pos:pos + len(w)] = w
        pos += len(w)
    return pd.Series(flat, dtype=object), counts


class LangId:
    """Stopword-vote language classifier; 'und' (undetermined) when no
    stopword hits. Deterministic; ties broken by language-code order.
    Vectorized: one flat word array per batch, ``isin`` per language,
    ``bincount`` votes — no per-word Python membership loop."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-ZäöüßáéíóúñàâçèêîôûÄÖÜ]+")
        self.tables = sorted(STOPWORDS.items())  # deterministic tie-break

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # fillna BEFORE the word scan: a pandas 'string'-dtype column's
        # nulls are pd.NA, and `t or ''` raises on NA (QualityScore and
        # _shingle_frame already guard this)
        texts = batch["text"].fillna("").to_numpy()
        n = len(texts)
        flat, counts = _flatten_words(texts, self.word_re)
        doc_idx = np.repeat(np.arange(n), counts)
        votes = np.zeros((n, len(self.tables)), dtype=np.int64)
        for li, (_lang, sw) in enumerate(self.tables):
            hit = flat.isin(sw).to_numpy()
            votes[:, li] = np.bincount(doc_idx[hit], minlength=n)
        langs = np.array([lang for lang, _ in self.tables], dtype=object)
        best = votes.argmax(axis=1)       # ties → lowest index = lang order
        preds = np.where(votes.max(axis=1) > 0, langs[best], "und")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


# --- quality scoring (integer outputs → exact SQL oracle) ---

def quality_counts(batch: pa.Table) -> pa.Table:
    """Per-document integer quality signals: char length, whitespace-token
    count, digit count, uppercase count — the primitives length/punct/stopword
    quality filters are built from."""
    txt = batch.column("text")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_len": pc.cast(pc.utf8_length(txt), pa.int64()),
        "n_tokens": pc.cast(pc.add(pc.count_substring(txt, " "), 1), pa.int64()),
        "n_digits": pc.cast(pc.count_substring_regex(txt, "[0-9]"), pa.int64()),
        "n_upper": pc.cast(pc.count_substring_regex(txt, "[A-Z]"), pa.int64()),
    })


class QualityScore:
    """Composite quality score in [0, 1]: penalizes extreme length, high digit
    ratio, low stopword ratio — the shape of reference-quality heuristics
    (Gopher/C4-style rules, public knowledge). Float output → returned rounded
    to 6 decimals for stable comparison."""

    def __init__(self):
        self.stop = STOPWORDS["en"]
        self.word_re = re.compile(r"[a-z]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        texts = s.to_numpy()
        n = len(texts)
        lens = s.str.len().to_numpy(dtype=np.int64)
        digits = s.str.count(r"[0-9]").to_numpy(dtype=np.int64)
        flat, counts = _flatten_words(texts, self.word_re)
        doc_idx = np.repeat(np.arange(n), counts)
        hits = np.bincount(doc_idx[flat.isin(self.stop).to_numpy()],
                           minlength=n)
        stop_ratio = np.where(counts > 0, hits / np.maximum(counts, 1), 0.0)
        len_ok = np.clip((lens - 20) / 180.0, 0, 1)
        digit_pen = 1.0 - np.clip(digits / np.maximum(lens, 1) * 5, 0, 1)
        score = 0.4 * len_ok + 0.3 * digit_pen + 0.3 * np.clip(stop_ratio * 5, 0, 1)
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "quality": np.round(score, 6)})


# --- token counting (BPE-ish regex) ---

class TokenCount:
    """Whitespace token count + a GPT-2-style pre-tokenizer regex count (the
    public BPE split pattern) — a cheap proxy for LLM token budgeting."""

    PAT = (r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+|"
           r" ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

    def __init__(self):
        self.re = re.compile(self.PAT)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "ws_tokens": texts.str.count(" ").astype("int64") + 1,
            "bpe_tokens": texts.map(lambda t: len(self.re.findall(t))).astype("int64"),
        })


# --- document fingerprinting (rolling hash / winnowing) ---

MOD = np.uint64((1 << 31) - 1)     # Mersenne prime; products fit in uint64
BASE = np.uint64(263)


def rolling_hashes(data: bytes, window: int) -> np.ndarray:
    """All Rabin-Karp hashes of ``window``-byte substrings — fully vectorized
    via a sliding-window view × precomputed power vector (no per-byte loop)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) < window:
        return np.zeros(0, dtype=np.uint64)
    pows = np.empty(window, dtype=np.uint64)
    pows[0] = 1
    for i in range(1, window):
        pows[i] = (pows[i - 1] * BASE) % MOD
    # chunk the window matrix: materializing all (n−w+1, w) uint64 windows
    # plus the product temp is O(n·w·8) bytes — ~1.3 GB for a 10 MB doc at
    # w=16, twice. Chunking bounds the working set at ~32 MB while emitting
    # byte-identical hashes (same per-window arithmetic).
    n_out = len(b) - window + 1
    out = np.empty(n_out, dtype=np.uint64)
    rpows = pows[::-1].copy()
    CH = max(1, (1 << 22) // window)
    for c0 in range(0, n_out, CH):
        c1 = min(c0 + CH, n_out)
        wins = np.lib.stride_tricks.sliding_window_view(
            b[c0:c1 + window - 1], window).astype(np.uint64)
        # (byte < 2^8) × (pow < 2^31) summed over ≤ window terms < 2^63
        out[c0:c1] = (wins * rpows).sum(axis=1) % MOD
    return out


class Fingerprint:
    """Winnowing-style fingerprint: min rolling hash per document plus a
    16-hex digest of the k smallest hashes — cheap near-identity signature."""

    def __init__(self, window: int = 16, k: int = 8):
        self.window, self.k = window, k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps, mins = [], []
        for text in batch["text"].fillna("").to_numpy():
            hs = rolling_hashes(text.encode("utf-8", "ignore"), self.window)
            if len(hs) == 0:
                mins.append(0)
                fps.append("0" * 16)
                continue
            smallest = np.sort(hs)[: self.k]
            mins.append(int(smallest[0]))
            fps.append(f"{int(smallest.sum() % (1 << 64)):016x}")
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "min_hash": pd.array(mins, dtype="int64"),
                             "fingerprint": fps})
