#!/usr/bin/env python3
"""Python reference for the EXACT-REPLAY unigram trainer redesign
(driver-side tooling only). Mirrors the planned Scala arithmetic
bit-for-bit: probability-space lattices with pinned fold order,
per-occurrence integer quantization of expected counts, fixed
prune-round schedule. Used to validate the DuckDB oracle before the
Scala port."""
import re, sys, math
from collections import Counter

SEED_MAX_LEN = 4
MAX_SEEDS = 400
TARGET_VOCAB = 80
EM_PER_PRUNE = 2
PRUNE_ROUNDS = 24
PROB_FLOOR = 1e-12
QSCALE = 1e6


def word_freq(docs):
    wf = Counter()
    for t in docs:
        for w in re.split(r'\s+', t.lower().strip()):
            if len(w) >= 1:
                wf[w] += 1
    return wf


def seed_pieces(wf):
    subs = Counter()
    for w, f in wf.items():
        for l in range(2, SEED_MAX_LEN + 1):
            if len(w) >= l:
                for i in range(len(w) - l + 1):
                    subs[w[i:i + l]] += f
    ordered = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_SEEDS]
    chars = sorted({c for w in wf for c in w})
    return chars, [p for p, _ in ordered]


def lattice(word, p, n):
    """alpha[0..n], beta[0..n] in prob space, pinned fold order:
    alpha(j) = (((t1) + t2) + t3) + t4, t_l = alpha(j-l) * p(piece),
    l ascending; absent pieces contribute exactly 0.0."""
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        acc = 0.0
        for l in range(1, SEED_MAX_LEN + 1):
            i = j - l
            t = alpha[i] * p.get(word[i:j], 0.0) if i >= 0 else 0.0
            acc = acc + t
        alpha[j] = acc
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for l in range(1, SEED_MAX_LEN + 1):
            k = i + l
            t = p.get(word[i:k], 0.0) * beta[k] if k <= n else 0.0
            acc = acc + t
        beta[i] = acc
    return alpha, beta


def em_step(wf, p):
    counts = Counter()
    for w, f in wf.items():
        n = len(w)
        alpha, beta = lattice(w, p, n)
        z = alpha[n]
        if z <= 0.0:
            continue
        for i in range(n):
            for l in range(1, SEED_MAX_LEN + 1):
                k = i + l
                if k > n:
                    break
                piece = w[i:k]
                pp = p.get(piece)
                if pp is None:
                    continue
                # pinned order: ((((alpha*p)*beta)/z)*f)*QSCALE
                q = math.floor(((((alpha[i] * pp) * beta[k]) / z) * f) * QSCALE + 0.5)
                if q != 0:
                    counts[piece] += int(q)
    total = sum(counts.values())  # exact integer sum
    return {piece: max(counts.get(piece, 0) / total, PROB_FLOOR) for piece in p}


def alt_prob(piece, p):
    """Max left-assoc product over proper compositions (parts <= 4)."""
    n = len(piece)
    best = [None] * (n + 1)
    best[0] = 1.0
    for j in range(1, n + 1):
        for l in range(1, min(SEED_MAX_LEN, j) + 1):
            i = j - l
            sub = piece[i:j]
            if i == 0 and j == n:
                continue  # the piece itself is excluded
            pp = p.get(sub)
            if pp is None or best[i] is None:
                continue
            cand = best[i] * pp
            if best[j] is None or cand > best[j]:
                best[j] = cand
    return best[n]


def train(wf):
    chars, seeds = seed_pieces(wf)
    charset = set(chars)
    init = chars + [s for s in seeds if s not in charset]
    p = {piece: 1.0 / len(init) for piece in init}
    eff_target = max(TARGET_VOCAB, len(chars))
    for _ in range(PRUNE_ROUNDS):
        for _ in range(EM_PER_PRUNE):
            p = em_step(wf, p)
        multi = [x for x in p if x not in charset]
        losses = {}
        for x in multi:
            alt = alt_prob(x, p)
            losses[x] = p[x] * math.log(p[x] / alt)
        ordered = sorted(multi, key=lambda x: (-losses[x], x))
        keep_n = max(eff_target - len(chars), int(len(multi) * 0.8))
        if keep_n >= len(multi):
            kept = set(ordered[:max(0, eff_target - len(chars))])
        else:
            kept = set(ordered[:keep_n])
        p = {x: v for x, v in p.items() if x in charset or x in kept}
    for _ in range(EM_PER_PRUNE):
        p = em_step(wf, p)
    return chars, p


def viterbi_count(word, p):
    """(best prob, piece count) per word; candidates l=4..1, replace on
    strictly-greater prob or equal prob with fewer pieces."""
    n = len(word)
    bp = [0.0] * (n + 1)
    bc = [0] * (n + 1)
    bp[0] = 1.0
    for j in range(1, n + 1):
        cp, cc = 0.0, 0
        for l in range(min(SEED_MAX_LEN, j), 0, -1):
            i = j - l
            pp = p.get(word[i:j], 0.0)
            cand = bp[i] * pp
            cn = bc[i] + 1
            if cand > cp or (cand == cp and cand > 0.0 and cn < cc):
                cp, cc = cand, cn
        bp[j], bc[j] = cp, cc
    return bp[n], bc[n]


def main():
    import duckdb
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    docs = [t for (t,) in con.execute("SELECT text FROM documents").fetchall()]
    wf = word_freq(docs)
    chars, p = train(wf)
    print(f"chars={len(chars)} model={len(p)}")
    for piece in sorted(p)[:10]:
        print(f"  {piece!r} logp={round(math.log(p[piece]), 6)}")
    # q111-shaped rollup
    rows = con.execute("SELECT doc_id, lower(trim(text)) FROM documents").fetchall()
    out = []
    seg = {w: viterbi_count(w, p) for w in wf}
    for did, t in rows:
        ws = [w for w in re.split(r'\s+', t) if len(w) >= 1]
        nc = sum(len(w) for w in ws)
        nt = sum(seg[w][1] for w in ws)
        out.append((did, nc, nt, len(ws)))
    print("docs:", len(out), "total_tokens:", sum(r[2] for r in out))


if __name__ == "__main__":
    main()
