#!/usr/bin/env python
"""Generate the checked-in real-data recall sample (bench_data/text10k.fvecs).

BASELINE.md configs 1-2 call for recall on real embedding geometry
(SIFT/GloVe), but this build environment has no network egress, so no
public benchmark set is fetchable.  This script derives embeddings from
REAL TEXT instead: every .py/.md/.rs file under the repo (and the
reference checkout when present) is chunked into ~400-char windows,
embedded as character-trigram TF-IDF (hashed to 4096 buckets, Zipfian
feature mass, heavy tails), then projected to 128-d with a fixed
Gaussian projection and L2-normalized — the standard random-projection
embedding.  The result has the properties synthetic Gaussian mixtures
lack: anisotropic covariance, natural cluster structure (files/dirs),
duplicate-ish near neighbors, and a non-uniform norm profile before
normalization.

Output format: .fvecs (int32 dim + dim f32 little-endian per vector),
the SIFT/GloVe container bench.py's VST_BENCH_FVECS loader reads.
Deterministic: same inputs → same bytes.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_data", "text10k.fvecs")
N = 10_000
D = 128
HASH_DIM = 4096
CHUNK = 400
ROOTS = [
    os.path.join(os.path.dirname(__file__), ".."),
    "/root/reference",
    # large real-prose/code corpora present in any python environment
    os.path.dirname(os.__file__),
    os.path.dirname(np.__file__),
]
EXT = (".py", ".md", ".rs", ".toml", ".cpp", ".yml", ".rst", ".txt")


def iter_chunks():
    for root in ROOTS:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(
                d for d in dirnames if d not in (".git", "__pycache__", "bench_data")
            )
            for fn in sorted(filenames):
                if not fn.endswith(EXT):
                    continue
                try:
                    with open(os.path.join(dirpath, fn), encoding="utf-8") as fh:
                        text = fh.read()
                except (OSError, UnicodeDecodeError):
                    continue
                text = re.sub(r"\s+", " ", text)
                for off in range(0, max(len(text) - CHUNK, 1), CHUNK // 2):
                    yield text[off : off + CHUNK]


def embed(chunks: list[str]) -> np.ndarray:
    # char-trigram hashed TF-IDF
    counts = np.zeros((len(chunks), HASH_DIM), dtype=np.float32)
    for i, c in enumerate(chunks):
        b = c.encode("utf-8", "ignore")
        for j in range(len(b) - 2):
            # FNV-1a over the trigram — stable across runs/platforms
            h = 2166136261
            for byte in b[j : j + 3]:
                h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
            counts[i, h % HASH_DIM] += 1.0
    tf = np.log1p(counts)
    df = (counts > 0).sum(axis=0)
    idf = np.log((1 + len(chunks)) / (1 + df)).astype(np.float32)
    x = tf * idf
    # fixed Gaussian projection to D, then L2 normalize
    rng = np.random.default_rng(1234)
    proj = rng.normal(size=(HASH_DIM, D)).astype(np.float32) / np.sqrt(D)
    y = x @ proj
    y /= np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-9)
    return y.astype(np.float32)


def write_fvecs(path: str, x: np.ndarray) -> None:
    n, d = x.shape
    rec = np.empty((n, 1 + d), dtype=np.float32)
    rec[:, 0] = np.frombuffer(
        np.full((n,), d, dtype=np.int32).tobytes(), dtype=np.float32
    )
    rec[:, 1:] = x
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rec.tofile(path)


def main() -> None:
    chunks = []
    for c in iter_chunks():
        chunks.append(c)
        if len(chunks) >= N * 2:
            break
    if len(chunks) < N:
        print(f"only {len(chunks)} chunks found; need {N}", file=sys.stderr)
        sys.exit(1)
    # deterministic subsample spread across the corpus
    idx = np.linspace(0, len(chunks) - 1, N).astype(int)
    x = embed([chunks[i] for i in idx])
    write_fvecs(OUT, x)
    print(f"wrote {OUT}: {x.shape}, norm mean {np.linalg.norm(x, axis=1).mean():.3f}")


if __name__ == "__main__":
    main()
