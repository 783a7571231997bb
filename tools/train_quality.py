#!/usr/bin/env python3
"""Offline trainer for the quality_classifier weight table.

Fits a 1024-bucket hashed-feature logistic regression (the fastText /
CCNet quality-filter shape) on a DETERMINISTIC synthetic prose-vs-junk
corpus labeled by the real Gopher rule suite (the same rules
graft.operators.Curation.gopherRules implements), then quantizes the
coefficients to integers so the Spark scorer and the DuckDB oracle can
replay keep decisions exactly.

Everything is index-derived — no RNG, no timestamps — so re-running the
script reproduces the committed weight array bit-for-bit. Output: the
Scala literal for graft/operators/QualityWeights.scala and a train/test
quality report.

Run: python3 tools/train_quality.py
"""
import hashlib
import re

import numpy as np

BUCKETS = 1024
SCALE = 1000  # integer quantization: w_int = round(w * SCALE)

# 100 common English words (stopwords first — the Gopher stop gate needs
# them present); junk vocabulary mimics spam/keyword-stuffing/markup.
PROSE = (
    "the be to of and that have with it is in for not on as you do at "
    "this but his by from they we say her she or an will my one all "
    "would there their what so up out if about who get which go me when "
    "make can like time no just him know take people into year your good "
    "some could them see other than then now look only come its over "
    "think also back after use two how our work first well way even new "
    "want because any these give day most us great long small own old "
    "right big high different such why ask men need").split()
JUNK = (
    "buy cheap casino loan click free win credit $$$ !!! ### 0x1f 0xdead "
    "111 222222 3333333 99999999 aaaaaaaaaaaaaaaaaaaa zzzzzzzzzzzz "
    "qqqqqqqqqq href= <div> </div> [url] {json} %%% ~~~ === +++ 4u2 "
    "l33t w1n n0w fr33 2022 2023 2024 12345 67890").split()
STOPS = {"the", "be", "to", "of", "and", "that", "have", "with"}


def bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % BUCKETS


def gopher_keep(toks) -> bool:
    n = len(toks)
    if not (50 <= n <= 100_000):
        return False
    sl = sum(len(t) for t in toks)
    if not (3 * n <= sl <= 10 * n):
        return False
    na = sum(1 for t in toks if re.search("[a-zA-Z]", t))
    if not (5 * na >= 4 * n):
        return False
    return len(set(toks) & STOPS) >= 2


def make_corpus(offset: int):
    """400 docs: even = prose-leaning, odd = junk-leaning; lengths span
    the 50-word Gopher floor; every doc mixes a (deterministic) fraction
    of the other class so the boundary isn't linearly trivial."""
    docs = []
    for i in range(400):
        n = 30 + (i * 7 + offset) % 90  # 30..119 words
        mix = (i * 13 + offset) % 10    # 0..9 tenths of contamination
        toks = []
        for j in range(n):
            other = (j % 10) < (mix // 2)  # up to 40% of the other class
            if (i % 2 == 0) != other:      # prose word
                toks.append(PROSE[(i * 17 + j * 31 + offset) % len(PROSE)])
            else:                          # junk word
                toks.append(JUNK[(i * 11 + j * 23 + offset) % len(JUNK)])
        docs.append(toks)
    return docs


def featurize(docs):
    x = np.zeros((len(docs), BUCKETS))
    for r, toks in enumerate(docs):
        for t in toks:
            x[r, bucket(t)] += 1.0
    return x


def train(x, y, epochs=3000, lr=0.05, l2=1e-4):
    w = np.zeros(BUCKETS)
    b = 0.0
    for _ in range(epochs):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g / len(y) + l2 * w)
        b -= lr * g.mean()
    return w, b


def auc(scores, labels):
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels.astype(bool)
    n1, n0 = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)


def main():
    train_docs = make_corpus(offset=0)
    y = np.array([gopher_keep(d) for d in train_docs], dtype=float)
    print(f"train: {len(train_docs)} docs, keep rate {y.mean():.3f}")
    x = featurize(train_docs)
    w, b = train(x, y)

    wi = np.round(w * SCALE).astype(np.int64)
    bi = int(round(b * SCALE))
    train_scores = x @ wi + bi
    acc = ((train_scores > 0) == y.astype(bool)).mean()
    print(f"quantized train acc {acc:.3f}, AUC {auc(train_scores, y):.3f}")

    held = make_corpus(offset=5000)
    yh = np.array([gopher_keep(d) for d in held], dtype=float)
    sh = featurize(held) @ wi + bi
    print(f"held-out ({yh.mean():.3f} keep): "
          f"acc {((sh > 0) == yh.astype(bool)).mean():.3f}, AUC {auc(sh, yh):.3f}")

    vals = ", ".join(str(v) + "L" for v in wi)
    print(f"\n  val Bias: Long = {bi}L")
    print(f"  val W: Array[Long] = Array({vals})")


if __name__ == "__main__":
    main()
