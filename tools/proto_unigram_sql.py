#!/usr/bin/env python3
"""Generates the DuckDB replay SQL for the exact-arithmetic unigram
trainer and diffs it against proto_unigram_ref.py's python reference.
The generator here is the template for the Scala oracle port."""
import sys, math, time
import duckdb
import proto_unigram_ref as ref

SEED_MAX_LEN = 4
MAX_SEEDS = 400
TARGET_VOCAB = 80
EM_PER_PRUNE = 2
PRUNE_ROUNDS = 24

ACC_FIELDS = "w DOUBLE[], p1 DOUBLE, p2 DOUBLE, p3 DOUBLE, p4 DOUBLE"

# DuckDB 1.0 list_reduce caveats (empirically pinned):
#  - multi-field evolving struct accumulators alias after step 2;
#  - list_append-grown accumulator lists corrupt;
#  - a FIXED-SIZE list field REPLACED wholesale each step is correct.
INIT_ACC = ("{'w': [CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)], "
            "'p1': CAST(0.0 AS DOUBLE), 'p2': CAST(0.0 AS DOUBLE), "
            "'p3': CAST(0.0 AS DOUBLE), 'p4': CAST(0.0 AS DOUBLE)}")

NEWVAL = "(((a.w[1] * e.p1) + a.w[2] * e.p2) + a.w[3] * e.p3) + a.w[4] * e.p4"

STEP = ("(a, e) -> {{'w': [{nv}, a.w[1], a.w[2], a.w[3]], "
        "'p1': CAST(0.0 AS DOUBLE), 'p2': CAST(0.0 AS DOUBLE), "
        "'p3': CAST(0.0 AS DOUBLE), 'p4': CAST(0.0 AS DOUBLE)}}").format(nv=NEWVAL)


def head_ctes():
    return r"""tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
uwstream AS MATERIALIZED (SELECT doc_id, unnest(w) AS word FROM tok),
uwf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM uwstream WHERE length(word) >= 1 GROUP BY word),
uchars AS MATERIALIZED (
  SELECT DISTINCT substr(word, j, 1) AS piece
  FROM uwf, unnest(range(1, length(word) + 1)) t(j)),
usubs AS MATERIALIZED (
  SELECT piece FROM (
    SELECT substr(word, i, l) AS piece, CAST(sum(freq) AS BIGINT) AS c
    FROM uwf, unnest(range(2, {ml} + 1)) tl(l),
         unnest(range(1, length(word) - l + 2)) ti(i)
    WHERE length(word) >= l
    GROUP BY 1)
  ORDER BY c DESC, piece LIMIT {ms}),
um0 AS MATERIALIZED (
  SELECT piece,
    1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM
      (SELECT piece FROM uchars UNION SELECT piece FROM usubs)) AS p
  FROM (SELECT piece FROM uchars UNION SELECT piece FROM usubs)),
uocc AS MATERIALIZED (
  SELECT f.word, f.freq, ti.i, tl.l, substr(f.word, ti.i + 1, tl.l) AS piece
  FROM uwf f, unnest(range(1, {ml} + 1)) tl(l),
       unnest(range(0, length(f.word) - tl.l + 1)) ti(i)
  WHERE length(f.word) >= tl.l)""".format(ml=SEED_MAX_LEN, ms=MAX_SEEDS)


def em_ctes(s, prev):
    """One EM stage: model {prev} -> umE{s}. alpha(j)/beta(i) come from
    PREFIX/SUFFIX folds with a scalar struct accumulator (DuckDB 1.0's
    list_reduce corrupts list-valued accumulator fields)."""
    elem = ("CAST({{'w': [], "
            "'p1': p1, 'p2': p2, 'p3': p3, 'p4': p4}} AS STRUCT({af}))"
            ).format(af=ACC_FIELDS)
    return f"""uop{s} AS MATERIALIZED (
  SELECT o.word, o.freq, o.i, o.l, o.piece, coalesce(m.p, CAST(0.0 AS DOUBLE)) AS p
  FROM uocc o LEFT JOIN {prev} m USING (piece)),
uend{s} AS (
  SELECT word, i + l AS j,
    CAST(coalesce(max(CASE WHEN l = 1 THEN p END), 0.0) AS DOUBLE) AS p1,
    CAST(coalesce(max(CASE WHEN l = 2 THEN p END), 0.0) AS DOUBLE) AS p2,
    CAST(coalesce(max(CASE WHEN l = 3 THEN p END), 0.0) AS DOUBLE) AS p3,
    CAST(coalesce(max(CASE WHEN l = 4 THEN p END), 0.0) AS DOUBLE) AS p4
  FROM uop{s} GROUP BY word, i + l),
ustart{s} AS (
  SELECT word, i,
    CAST(coalesce(max(CASE WHEN l = 1 THEN p END), 0.0) AS DOUBLE) AS p1,
    CAST(coalesce(max(CASE WHEN l = 2 THEN p END), 0.0) AS DOUBLE) AS p2,
    CAST(coalesce(max(CASE WHEN l = 3 THEN p END), 0.0) AS DOUBLE) AS p3,
    CAST(coalesce(max(CASE WHEN l = 4 THEN p END), 0.0) AS DOUBLE) AS p4
  FROM uop{s} GROUP BY word, i),
ua{s} AS MATERIALIZED (
  SELECT e1.word, e2.j,
    list_reduce(list_prepend({INIT_ACC},
      list({elem} ORDER BY e1.j)), {STEP}).w[1] AS a
  FROM uend{s} e1 JOIN (SELECT DISTINCT word, j FROM uend{s}) e2
    ON e1.word = e2.word AND e1.j <= e2.j
  GROUP BY e1.word, e2.j
  UNION ALL
  SELECT word, 0, CAST(1.0 AS DOUBLE) FROM uwf),
ub{s} AS MATERIALIZED (
  SELECT s1.word, s2.i,
    list_reduce(list_prepend({INIT_ACC},
      list({elem} ORDER BY s1.i DESC)), {STEP}).w[1] AS b
  FROM ustart{s} s1 JOIN (SELECT DISTINCT word, i FROM ustart{s}) s2
    ON s1.word = s2.word AND s1.i >= s2.i
  GROUP BY s1.word, s2.i
  UNION ALL
  SELECT word, length(word), CAST(1.0 AS DOUBLE) FROM uwf),
ucnt{s} AS MATERIALIZED (
  SELECT o.piece, CAST(sum(CAST(floor(((((ai.a * m.p) * bk.b)
      / zz.a) * o.freq) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM uocc o JOIN {prev} m USING (piece)
  JOIN ua{s} ai ON ai.word = o.word AND ai.j = o.i
  JOIN ub{s} bk ON bk.word = o.word AND bk.i = o.i + o.l
  JOIN ua{s} zz ON zz.word = o.word AND zz.j = length(o.word)
  WHERE zz.a > 0.0
  GROUP BY o.piece),
umE{s} AS MATERIALIZED (
  SELECT m.piece,
    greatest(CAST(coalesce(c.c, 0) AS DOUBLE)
      / (SELECT CAST(sum(c) AS DOUBLE) FROM ucnt{s}), CAST(1e-12 AS DOUBLE)) AS p
  FROM {prev} m LEFT JOIN ucnt{s} c USING (piece))"""


def alt_candidates(n):
    """Left-assoc product candidates over proper compositions of n into
    parts <= SEED_MAX_LEN, as (list of (offset, len)) tuples."""
    out = []
    def rec(pos, parts):
        if pos == n:
            if len(parts) > 1:
                out.append(list(parts))
            return
        for l in range(1, min(SEED_MAX_LEN, n - pos) + 1):
            parts.append((pos, l))
            rec(pos + l, parts)
            parts.pop()
    rec(0, [])
    return out


def prune_ctes(s, prev):
    """Prune stage over model {prev} -> umP{s}."""
    def prod(parts):
        terms = [f"sp{o}_{l}.p" for (o, l) in parts]
        e = terms[0]
        for t in terms[1:]:
            e = f"({e} * {t})"
        return e
    # candidate products per piece length, joined lookups for needed subs
    lens = {}
    joins = {}
    for n in range(2, SEED_MAX_LEN + 1):
        cands = alt_candidates(n)
        needed = sorted({(o, l) for c in cands for (o, l) in c})
        lens[n] = (cands, needed)
    sel = []
    for n in range(2, SEED_MAX_LEN + 1):
        cands, needed = lens[n]
        jo = " ".join(
            f"LEFT JOIN {prev} sp{o}_{l} ON sp{o}_{l}.piece = substr(x.piece, {o + 1}, {l})"
            for (o, l) in needed)
        prods = ", ".join(prod(c) for c in cands)
        sel.append(f"""SELECT x.piece, x.p,
      (SELECT max(v) FROM unnest([{prods}]) t(v)) AS alt
    FROM (SELECT piece, p FROM {prev} WHERE length(piece) = {n}) x {jo}""")
    union = "\n    UNION ALL\n    ".join(sel)
    return f"""ulo{s} AS MATERIALIZED (
  SELECT piece, p, p * ln(p / alt) AS loss FROM (
    {union})),
urk{s} AS (
  SELECT piece, row_number() OVER (ORDER BY loss DESC, piece) AS rk,
    (SELECT count(*) FROM ulo{s}) AS multi_n,
    (SELECT count(*) FROM uchars) AS nchars
  FROM ulo{s}),
umP{s} AS MATERIALIZED (
  SELECT m.piece, m.p FROM {prev} m
  WHERE length(m.piece) = 1
     OR m.piece IN (
       SELECT piece FROM urk{s}
       WHERE rk <= (CASE
         WHEN greatest(greatest({TARGET_VOCAB}, nchars) - nchars,
                       CAST(trunc(CAST(multi_n AS DOUBLE) * 0.8) AS BIGINT)) >= multi_n
         THEN greatest(greatest({TARGET_VOCAB}, nchars) - nchars, 0)
         ELSE greatest(greatest({TARGET_VOCAB}, nchars) - nchars,
                       CAST(trunc(CAST(multi_n AS DOUBLE) * 0.8) AS BIGINT))
       END)))"""


def build_train_sql():
    parts = [head_ctes()]
    prev = "um0"
    stage = 0
    for r in range(PRUNE_ROUNDS):
        for _ in range(EM_PER_PRUNE):
            stage += 1
            parts.append(em_ctes(stage, prev))
            prev = f"umE{stage}"
        parts.append(prune_ctes(r + 1, prev))
        prev = f"umP{r + 1}"
    for _ in range(EM_PER_PRUNE):
        stage += 1
        parts.append(em_ctes(stage, prev))
        prev = f"umE{stage}"
    return ",\n".join(parts), prev


VIT_FIELDS = "w DOUBLE[], p1 DOUBLE, p2 DOUBLE, p3 DOUBLE, p4 DOUBLE"

# Viterbi window: w = [bp1..bp4, bc1..bc4] (probs then counts-as-doubles;
# counts are < 2^53, exact). Candidate pick = lexicographic max of
# (prob, -count) structs, sentinel (0.0, 0) — identical to the scan
# rule: strictly-greater prob, or equal positive prob with fewer pieces.
VIT_INIT = ("{'w': [CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), "
            "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)], "
            "'p1': CAST(0.0 AS DOUBLE), 'p2': CAST(0.0 AS DOUBLE), "
            "'p3': CAST(0.0 AS DOUBLE), 'p4': CAST(0.0 AS DOUBLE)}")

VIT_PICK = ("list_extract(array_sort(["
            "{'p': CAST(0.0 AS DOUBLE), 'nc': CAST(0.0 AS DOUBLE)}, "
            "{'p': a.w[1] * e.p1, 'nc': -(a.w[5] + 1)}, "
            "{'p': a.w[2] * e.p2, 'nc': -(a.w[6] + 1)}, "
            "{'p': a.w[3] * e.p3, 'nc': -(a.w[7] + 1)}, "
            "{'p': a.w[4] * e.p4, 'nc': -(a.w[8] + 1)}]), -1)")

VIT_STEP = ("(a, e) -> {{'w': [struct_extract({pk}, 'p'), a.w[1], a.w[2], a.w[3], "
            "-struct_extract({pk}, 'nc'), a.w[5], a.w[6], a.w[7]], "
            "'p1': CAST(0.0 AS DOUBLE), 'p2': CAST(0.0 AS DOUBLE), "
            "'p3': CAST(0.0 AS DOUBLE), 'p4': CAST(0.0 AS DOUBLE)}}").format(pk=VIT_PICK)


def encode_ctes(final_model):
    elem = ("CAST({{'w': [], "
            "'p1': p1, 'p2': p2, 'p3': p3, 'p4': p4}} AS STRUCT({vf}))"
            ).format(vf=VIT_FIELDS)
    return f"""uvop AS (
  SELECT o.word, o.i, o.l, coalesce(m.p, CAST(0.0 AS DOUBLE)) AS p
  FROM uocc o LEFT JOIN {final_model} m USING (piece)),
uvend AS (
  SELECT word, i + l AS j,
    CAST(coalesce(max(CASE WHEN l = 1 THEN p END), 0.0) AS DOUBLE) AS p1,
    CAST(coalesce(max(CASE WHEN l = 2 THEN p END), 0.0) AS DOUBLE) AS p2,
    CAST(coalesce(max(CASE WHEN l = 3 THEN p END), 0.0) AS DOUBLE) AS p3,
    CAST(coalesce(max(CASE WHEN l = 4 THEN p END), 0.0) AS DOUBLE) AS p4
  FROM uvop GROUP BY word, i + l),
uvt AS MATERIALIZED (
  SELECT word, list_reduce(list_prepend({VIT_INIT},
    list({elem} ORDER BY j)), {VIT_STEP}).w AS w
  FROM uvend GROUP BY word),
useg AS MATERIALIZED (
  SELECT word,
    CASE WHEN w[1] > 0.0 THEN CAST(w[5] AS BIGINT) END AS n_pieces
  FROM uvt)"""


def q111_sql():
    ctes, final = build_train_sql()
    return f"""WITH {ctes},
{encode_ctes(final)}
SELECT s.doc_id,
  CAST(sum(length(s.word)) AS BIGINT) AS n_chars,
  CAST(sum(g.n_pieces) AS BIGINT) AS n_unigram_tokens,
  CAST(count(*) AS BIGINT) AS n_words,
  round(CAST(sum(length(s.word)) AS DOUBLE) / sum(g.n_pieces), 6) AS compression
FROM uwstream s JOIN useg g ON g.word = s.word
GROUP BY s.doc_id ORDER BY s.doc_id"""


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    ctes, final = build_train_sql()
    sql = f"WITH {ctes}\nSELECT piece, round(ln(p), 6) AS logp, length(piece) = 1 AS is_char FROM {final} ORDER BY piece"
    t0 = time.time()
    got = con.execute(sql).fetchall()
    dt = time.time() - t0
    docs = [t for (t,) in con.execute("SELECT text FROM documents").fetchall()]
    wf = ref.word_freq(docs)
    chars, p = ref.train(wf)
    exp = sorted((piece, round(math.log(v), 6), len(piece) == 1) for piece, v in p.items())
    gotn = [(a, b, c) for (a, b, c) in got]
    ok = True
    if len(gotn) != len(exp):
        print(f"SIZE sql={len(gotn)} ref={len(exp)}")
        print(" sql-only:", sorted(set(x[0] for x in gotn) - set(x[0] for x in exp))[:10])
        print(" ref-only:", sorted(set(x[0] for x in exp) - set(x[0] for x in gotn))[:10])
        ok = False
    else:
        for g, e in zip(gotn, exp):
            if g[0] != e[0] or abs(g[1] - e[1]) > 0 or g[2] != e[2]:
                print("DIFF", g, e); ok = False
    print("q110", "MATCH" if ok else "MISMATCH", f"{dt:.2f}s", f"model={len(gotn)}")
    # q111
    t0 = time.time()
    got111 = con.execute(q111_sql()).fetchall()
    dt = time.time() - t0
    rows = con.execute("SELECT doc_id, lower(trim(text)) FROM documents").fetchall()
    import re as _re
    seg = {w: ref.viterbi_count(w, p) for w in wf}
    ok = True
    exp111 = {}
    for did, t in rows:
        ws = [w for w in _re.split(r'\s+', t) if len(w) >= 1]
        nc = sum(len(w) for w in ws)
        nt = sum(seg[w][1] for w in ws)
        exp111[did] = (nc, nt, len(ws))
    for did, nc, nt, nw, comp in got111:
        e = exp111[did]
        if (nc, nt, nw) != e:
            print("DIFF111", did, (nc, nt, nw), e); ok = False
    print("q111", "MATCH" if ok and len(got111) == len(exp111) else "MISMATCH", f"{dt:.2f}s")


if __name__ == "__main__":
    main()
