#!/usr/bin/env python3
"""Prototype harness for the WordPiece q140/q141 DuckDB oracles (driver-side
tooling only). Mirrors WordPieceOps in python, builds the candidate oracle
SQL, and diffs the two — run before porting the SQL into Scala."""
import duckdb, re, sys, time
from collections import Counter

con = duckdb.connect()
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")

rows = con.execute("SELECT doc_id, lower(trim(text)) FROM documents").fetchall()
wf = Counter(); docwords = {}
for did, t in rows:
    ws = [w for w in re.split(r'\s+', t) if len(w) >= 1]
    docwords[did] = ws; wf.update(ws)

def initsyms(w): return [w[0]] + ['##' + c for c in w[1:]]
syms = {w: initsyms(w) for w in wf}
merges = []
for rnd in range(8):
    pc = Counter(); uc = Counter()
    for w, f in wf.items():
        s = syms[w]
        for u in s: uc[u] += f
        for i in range(len(s) - 1): pc[(s[i], s[i+1])] += f
    best = None
    for (l, r), c in pc.items():
        sc = float(c) / (float(uc[l]) * float(uc[r]))
        k = (-sc, l, r)
        if best is None or k < best[0]: best = (k, (l, r, sc))
    l, r, sc = best[1]
    merged = l + (r[2:] if r.startswith('##') else r)
    merges.append((l, r, merged, sc))
    for w in wf:
        s = syms[w]; out = []
        for c in s:
            if out and out[-1] == l and c == r: out[-1] = merged
            else: out.append(c)
        syms[w] = out

vocab = set()
for w in wf: vocab.update(initsyms(w))
vocab.update(m[2] for m in merges)

def encode(w):
    out = []; i = 0
    while i < len(w):
        pre = '' if i == 0 else '##'
        j = len(w); hit = None
        while j > i and hit is None:
            cand = pre + w[i:j]
            if cand in vocab: hit = cand
            else: j -= 1
        if hit is None: return ['[UNK]']
        out.append(hit); i = j
    return out

seg = {w: encode(w) for w in wf}
ref141 = {}
for did, ws in docwords.items():
    nc = sum(len(w) for w in ws); nt = sum(len(seg[w]) for w in ws)
    nu = sum(1 for w in ws if seg[w][0] == '[UNK]')
    ref141[did] = (nc, nt, nu, len(ws), round(nc / nt, 6))

def wp_ctes(n=8):
    parts = ["""tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
wstream AS MATERIALIZED (SELECT doc_id, unnest(w) AS word FROM tok),
wst0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq,
    '  ' || substr(word, 1, 1) || regexp_replace(substr(word, 2), '(.)', '  ##\\1', 'g') || '  ' AS s
  FROM wstream WHERE length(word) >= 1 GROUP BY word)"""]
    for r in range(1, n + 1):
        parts.append(f"""wpc{r} AS (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS c
  FROM (SELECT freq, string_split(s, '  ') AS syms FROM wst{r-1}),
       unnest(range(2, len(syms)-1)) AS u(i)
  GROUP BY 1, 2),
wuc{r} AS (
  SELECT syms[i] AS u, CAST(sum(freq) AS BIGINT) AS cu
  FROM (SELECT freq, string_split(s, '  ') AS syms FROM wst{r-1}),
       unnest(range(2, len(syms))) AS t(i)
  GROUP BY 1),
wbest{r} AS MATERIALIZED (
  SELECT p.l, p.r, p.l || regexp_replace(p.r, '^##', '') AS merged,
    CAST(p.c AS DOUBLE) / (CAST(cl.cu AS DOUBLE) * CAST(cr.cu AS DOUBLE)) AS score
  FROM wpc{r} p JOIN wuc{r} cl ON cl.u = p.l JOIN wuc{r} cr ON cr.u = p.r
  ORDER BY score DESC, p.l, p.r LIMIT 1)""")
        if r < n:
            parts.append(f"""wst{r} AS MATERIALIZED (SELECT word, freq,
  replace(wst{r-1}.s, ' '||b.l||'  '||b.r||' ', ' '||b.merged||' ') AS s
  FROM wst{r-1}, wbest{r} b)""")
    return ",\n".join(parts)

doublings = "".join(f""",
j{k+1} AS MATERIALIZED (
  SELECT a.word, a.i,
    CASE WHEN a.unk OR a.nxt >= length(a.word) THEN a.nxt ELSE b.nxt END AS nxt,
    CASE WHEN a.unk OR a.nxt >= length(a.word) THEN a.cnt ELSE a.cnt + b.cnt END AS cnt,
    CASE WHEN a.unk THEN true WHEN a.nxt >= length(a.word) THEN false ELSE b.unk END AS unk
  FROM j{k} a LEFT JOIN j{k} b ON b.word = a.word AND b.i = a.nxt)""" for k in range(6))

t0 = time.time()
sql140 = "WITH " + wp_ctes() + ",\nmerges AS (" + \
  " UNION ALL ".join(f'SELECT CAST({r} AS BIGINT) AS rank, l AS "left", r AS "right", merged, score FROM wbest{r}' for r in range(1, 9)) + \
  ")\nSELECT * FROM merges ORDER BY rank"
got = con.execute(sql140).fetchall()
ok = True
for (rk, l, r, m, sc), (rl, rr, rm, rsc) in zip(got, merges):
    if (l, r, m) != (rl, rr, rm) or sc != rsc:
        print("DIFF140", (rk, l, r, m, sc), (rl, rr, rm, rsc)); ok = False
print("q140", "MATCH" if ok else "MISMATCH", f"{time.time()-t0:.2f}s")

t0 = time.time()
sql141 = "WITH " + wp_ctes() + ",\nwmm AS (" + \
  " UNION ALL ".join(f"SELECT merged FROM wbest{r}" for r in range(1, 9)) + """),
wvocab AS MATERIALIZED (
  SELECT DISTINCT u, (u LIKE '##%') AS cont,
    CASE WHEN u LIKE '##%' THEN substr(u, 3) ELSE u END AS payload
  FROM (
    SELECT substr(word, 1, 1) AS u FROM wst0
    UNION
    SELECT '##' || substr(word, j, 1) FROM wst0, unnest(range(2, length(word)+1)) t(j)
    UNION
    SELECT merged FROM wmm)
),
pos AS MATERIALIZED (SELECT word, t.i FROM wst0, unnest(range(0, length(word))) t(i)),
j0 AS MATERIALIZED (
  SELECT jm.word, jm.i,
    CASE WHEN jm.best IS NULL THEN NULL ELSE jm.i + jm.best END AS nxt,
    1 AS cnt, jm.best IS NULL AS unk
  FROM (
    SELECT p.word, p.i, max(length(v.payload)) AS best
    FROM pos p
    LEFT JOIN wvocab v ON v.cont = (p.i > 0)
      AND v.payload = substr(p.word, p.i + 1, length(v.payload))
    GROUP BY 1, 2) jm
)""" + doublings + """,
wseg AS (
  SELECT word,
    CASE WHEN unk THEN 1 WHEN nxt = length(word) THEN cnt END AS n_pieces,
    unk AS is_unk
  FROM j6 WHERE i = 0
)
SELECT w.doc_id,
  CAST(sum(length(w.word)) AS BIGINT) AS n_chars,
  CAST(sum(v.n_pieces) AS BIGINT) AS n_wp_tokens,
  CAST(sum(CASE WHEN v.is_unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
  CAST(count(*) AS BIGINT) AS n_words,
  round(CAST(sum(length(w.word)) AS DOUBLE) / sum(v.n_pieces), 6) AS compression
FROM wstream w JOIN wseg v USING (word)
GROUP BY w.doc_id ORDER BY w.doc_id"""
got = con.execute(sql141).fetchall()
ok = True
for did, nc, nt, nu, nw, comp in got:
    r = ref141[did]
    if (nc, nt, nu, nw) != r[:4] or abs(comp - r[4]) > 1e-9:
        print("DIFF141", did, (nc, nt, nu, nw, comp), r); ok = False
print("q141 rows:", len(got), "MATCH" if ok and len(got) == len(ref141) else "MISMATCH", f"{time.time()-t0:.2f}s")
