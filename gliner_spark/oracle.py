"""DuckDB oracle SQL generators for the driver's correctness gate.

Each generator emits ANSI SQL over the driver's pre-registered views
(documents, embeddings, lineitem, …) that reproduces the corresponding
Spark operator's output EXACTLY (same column names, same rounding). The
SQL is generated from the same constants the Spark side uses
(``kernels.scorer.GAZETTEER``, ``operators.relations.DEFAULT_RULES``) so
the two sides cannot drift.

Oracle-ability notes (FIXTURES.md §5): the synthetic ``documents.text``
is strictly single-space-separated lowercase ASCII words (verified over
all SFs), so word tokenization ≡ ``string_split(text, ' ')`` and byte
offsets are prefix sums of word lengths plus separator counts — both
plain SQL. Greedy non-overlap selection is exercised but is the identity
on this corpus by gazetteer construction (no overlapping matches), which
is what makes a closed-form SQL oracle possible; overlap semantics are
covered by pytest goldens instead.
"""

from __future__ import annotations

from .kernels.scorer import GAZETTEER, SOUP_LABELS
from .operators.relations import DEFAULT_RULES, DEFAULT_WINDOW_BYTES


def _gaz_values(labels) -> tuple[str, str]:
    singles = []
    phrases = []
    for phrase, label, prob in GAZETTEER:
        if label not in labels:
            continue
        if len(phrase) == 1:
            singles.append(f"('{phrase[0]}', '{label}', {prob})")
        elif len(phrase) == 2:
            phrases.append(
                f"('{phrase[0]}', '{phrase[1]}', '{label}', {prob})"
            )
    return ", ".join(singles), ", ".join(phrases)


def mentions_cte(labels=SOUP_LABELS, table: str = "documents") -> str:
    """CTE body producing the mentions relation over ``table``."""
    singles, phrases = _gaz_values(labels)
    return f"""
gaz_single(term, label, prob) AS (VALUES {singles}),
gaz_phrase(w1, w2, label, prob) AS (VALUES {phrases}),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM {table}
),
pos AS (
  SELECT doc_id, w, ord,
         COALESCE(SUM(length(w)) OVER (
             PARTITION BY doc_id ORDER BY ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (ord - 1) AS s,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY ord) AS next_w,
         LAG(w) OVER (PARTITION BY doc_id ORDER BY ord) AS prev_w
  FROM toks
),
men AS (
  -- single-word matches; the anti-join drops noun occurrences covered by
  -- a phrase match (flat-NER greedy keeps the higher-prob phrase span)
  SELECT CAST(pos.doc_id AS VARCHAR) AS doc_id,
         CAST(s AS BIGINT) AS m_start,
         CAST(s + length(w) AS BIGINT) AS m_end,
         w AS m_text, gaz_single.label, CAST(gaz_single.prob AS DOUBLE) AS prob
  FROM pos
  JOIN gaz_single ON pos.w = gaz_single.term
  LEFT JOIN gaz_phrase gp ON gp.w2 = pos.w AND gp.w1 = pos.prev_w
  WHERE gp.w1 IS NULL
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR),
         CAST(s AS BIGINT),
         CAST(s + length(w1) + 1 + length(w2) AS BIGINT),
         w1 || ' ' || w2, label, CAST(prob AS DOUBLE)
  FROM pos JOIN gaz_phrase
    ON pos.w = gaz_phrase.w1 AND pos.next_w = gaz_phrase.w2
)"""


def ner_mentions_sql() -> str:
    return f"WITH {mentions_cte()} SELECT * FROM men"


def token_label_probs(labels=SOUP_LABELS) -> dict:
    """Per-label max gazetteer prob = the constant inside-score the
    TokenSurrogateScorer emits (kernels/scorer.py TokenSurrogateScorer)."""
    out: dict = {}
    for _phrase, label, prob in GAZETTEER:
        if label in labels:
            out[label] = max(out.get(label, 0.0), prob)
    return out


def token_mentions_sql(labels=SOUP_LABELS) -> str:
    """Token-level NER oracle (reference TokenDecoder,
    /root/reference/src/decoder.cpp:123-181).

    On this corpus the token-level span SET equals the span-level one
    (pytest-proven: tests/test_extensions.py
    test_token_level_matches_span_level_on_soup / _spark_operator —
    every overlap is a phrase-over-noun chain that the start/end/inside
    walk plus greedy tie-break resolves identically), while the PROB is
    the running mean of the per-label-constant inside score — i.e. the
    label constant itself (decoder.cpp:166-174)."""
    consts = token_label_probs(labels)
    cases = " ".join(
        f"WHEN label = '{k}' THEN {v}" for k, v in sorted(consts.items())
    )
    return f"""WITH {mentions_cte(labels)}
SELECT doc_id, m_start, m_end, m_text, label,
       CAST(CASE {cases} END AS DOUBLE) AS prob
FROM men"""


def ner_nested_sql(labels=SOUP_LABELS) -> str:
    """Oracle for the nested/multilabel driver query (flat_ner=False,
    multi_label=True — the Decoder-level defaults,
    /root/reference/include/GLiNER/decoder.hpp:21-29) over the
    pages-from-documents projection.

    On this corpus every overlapping mention pair is RANGE-intersecting
    (the phrase→inner-noun nestings), and hasOverlappingNested ≡
    hasOverlapping for intersecting non-identical ranges
    (decoder.cpp:16-29); identical-range multi-label pairs don't occur
    (each gazetteer word has one label). So the nested/multilabel output
    equals the flat one with doc_id = the page url. The MODE differences
    are pinned by pytest goldens (tests/test_kernels.py
    test_greedy_identical_range_multilabel / test_greedy_nested_flat_vs_nested)."""
    return f"""WITH pages AS (
  SELECT 'https://' || source || '.example/doc/' || CAST(doc_id AS VARCHAR)
           AS doc_id,
         text
  FROM documents
),
{mentions_cte(labels, table="pages")}
SELECT * FROM men"""


def ner_triples_sql(window_bytes: int = DEFAULT_WINDOW_BYTES) -> str:
    rules = ", ".join(
        f"('{s}', '{o}', '{p}')" for s, o, p in DEFAULT_RULES
    )
    return f"""WITH {mentions_cte()},
rules(r_subj, r_obj, pred) AS (VALUES {rules})
SELECT s.doc_id, s.m_text AS subj, s.label AS subj_label,
       s.m_start AS subj_start, r.pred,
       o.m_text AS obj, o.label AS obj_label, o.m_start AS obj_start,
       ROUND(s.prob * o.prob, 4) AS prob
FROM men s
JOIN men o ON s.doc_id = o.doc_id
          AND o.m_start > s.m_start
          AND o.m_start - s.m_start <= {window_bytes}
JOIN rules r ON s.label = r.r_subj AND o.label = r.r_obj"""


def surfaces_cte() -> str:
    """Distinct (label, surface) universe over mentions — mirrors
    operators/linking.entity_surfaces."""
    return """
surf AS (
  SELECT label, lower(m_text) AS surface,
         label || ':' || lower(m_text) AS sid,
         CAST(COUNT(*) AS BIGINT) AS n_mentions
  FROM men GROUP BY label, lower(m_text)
)"""


def links_cte(k: int = 3, threshold: float = 0.30) -> str:
    """Exact char-shingle Jaccard links — mirrors
    operators/linking.exact_jaccard_links. The max_bucket prune is a
    no-op at sf0.01 (≈30 distinct surfaces) so it is not mirrored."""
    return f"""
sh AS (
  SELECT sid, label,
         list_distinct(list_transform(
           generate_series(1, greatest(length(surface) - {k - 1}, 1)),
           i -> substr(surface, i, {k}))) AS grams
  FROM surf
),
expl AS (
  SELECT sid, label, len(grams) AS n_sh, unnest(grams) AS shingle FROM sh
),
links AS (
  SELECT src, dst,
         ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) AS sim
  FROM (
    SELECT a.sid AS src, b.sid AS dst, a.n_sh AS n_a, b.n_sh AS n_b,
           CAST(COUNT(*) AS BIGINT) AS inter
    FROM expl a
    JOIN expl b ON a.label = b.label AND a.shingle = b.shingle
               AND a.sid < b.sid
    GROUP BY 1, 2, 3, 4
  )
  WHERE ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) >= {threshold}
)"""


def kg_links_sql() -> str:
    return (
        f"WITH {mentions_cte()}, {surfaces_cte()}, {links_cte()} "
        "SELECT * FROM links"
    )


def kg_nodes_sql() -> str:
    """Connected components via recursive CTE (small scale only) —
    mirrors operators/canonicalize.canonical_entities + nodes_table."""
    return f"""WITH RECURSIVE {mentions_cte()}, {surfaces_cte()}, {links_cte()},
sym AS (
  SELECT src AS a, dst AS b FROM links
  UNION
  SELECT dst AS a, src AS b FROM links
),
reach(node, root) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node),
mapped AS (
  SELECT surf.sid, surf.label, surf.surface, surf.n_mentions,
         COALESCE(comp.component, surf.sid) AS entity_id
  FROM surf LEFT JOIN comp ON surf.sid = comp.node
),
canon AS (
  SELECT entity_id AS ce_id, surface AS canonical
  FROM mapped WHERE sid = entity_id
)
SELECT m.entity_id, c.canonical, m.label,
       CAST(SUM(m.n_mentions) AS BIGINT) AS n_mentions,
       CAST(COUNT(*) AS BIGINT) AS n_surfaces
FROM mapped m JOIN canon c ON m.entity_id = c.ce_id
GROUP BY 1, 2, 3"""


def kg_edges_sql() -> str:
    return f"""WITH base AS ({ner_triples_sql()})
SELECT subj, subj_label, pred, obj, obj_label,
       COUNT(*) AS support, ROUND(MAX(prob), 4) AS max_prob
FROM base GROUP BY subj, subj_label, pred, obj, obj_label"""


# ---------------------------------------------------------------------------
# training-data pipeline oracles (dedup / similarity / textstats / multimodal)
# ---------------------------------------------------------------------------

def dedup_exact_sql() -> str:
    """Mirrors operators/dedup.exact_dup_groups."""
    return """
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS content_hash
  FROM documents
),
g AS (
  SELECT content_hash, CAST(COUNT(*) AS BIGINT) AS group_size,
         MIN(doc_id) AS keep_id
  FROM h GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.group_size,
       h.doc_id = g.keep_id AS keep
FROM h JOIN g USING (content_hash)"""


def fingerprints_sql() -> str:
    """Mirrors operators/textstats.doc_fingerprints."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(text) AS content_hash,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                           ' ')) AS bag_fp,
       md5(array_to_string(list_slice(string_split(text, ' '), 1, 8),
                           ' ')) AS prefix_fp
FROM documents"""


def _ngram_pairs_cte(k: int = 3, threshold: float = 0.8) -> str:
    """``dup_pairs(src, dst, sim)`` CTE chain mirroring
    operators/dedup.ngram_jaccard_dups — shared by the pairwise query
    and the clustering query."""
    return f"""
w AS (
  SELECT CAST(doc_id AS BIGINT) AS sid, string_split(text, ' ') AS w
  FROM documents
),
sh AS (
  SELECT sid,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {k - 1}, 1)),
           i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))) AS g
  FROM w
),
e AS (SELECT sid, len(g) AS n, unnest(g) AS s FROM sh),
p AS (
  SELECT a.sid AS src, b.sid AS dst, a.n AS na, b.n AS nb,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM e a JOIN e b ON a.s = b.s AND a.sid < b.sid
  GROUP BY 1, 2, 3, 4
),
dup_pairs AS (
  SELECT src, dst,
         ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS sim
  FROM p
  WHERE ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= {threshold}
)"""


def dedup_ngram_sql(k: int = 3, threshold: float = 0.8) -> str:
    """Mirrors operators/dedup.ngram_jaccard_dups."""
    return f"WITH {_ngram_pairs_cte(k, threshold)} " \
           "SELECT * FROM dup_pairs"


def dedup_clusters_sql(k: int = 3, threshold: float = 0.8) -> str:
    """Mirrors operators/dedup.near_dup_clusters: transitive closure of
    the dup-pair graph via recursive CTE, cluster id = min member,
    singletons via left join."""
    return f"""WITH RECURSIVE {_ngram_pairs_cte(k, threshold)},
sym AS (
  SELECT src AS a, dst AS b FROM dup_pairs
  UNION
  SELECT dst AS a, src AS b FROM dup_pairs
),
reach(node, root) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node),
ids AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
lab AS (
  SELECT ids.doc_id,
         COALESCE(comp.component, ids.doc_id) AS cluster_id
  FROM ids LEFT JOIN comp ON comp.node = ids.doc_id
),
sz AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM lab GROUP BY 1
)
SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
       lab.doc_id = lab.cluster_id AS keep
FROM lab JOIN sz USING (cluster_id)"""


def dedup_simhash_sql(
    max_hamming: int = 6,
    band_bits: int = 8,
    max_bucket: int = 10_000,
) -> str:
    """Mirrors operators/dedup.simhash_dups with hash_family='md5_60':
    per-token 60-bit md5-fold hashes, majority bit-vote per bit into a
    signature (bits 60-63 always vote negative so the signature stays a
    non-negative BIGINT on both engines), byte-band blocking with the
    bucket guard, Hamming predicate on the pair."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, COALESCE(text, '') AS text
  FROM documents
),
hs AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM d WHERE length(text) > 0)
),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hs, range(0, 60) t(b) GROUP BY doc_id, b
),
sig0 AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS s
  FROM votes GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, COALESCE(sig0.s, 0)::BIGINT AS simhash
  FROM d LEFT JOIN sig0 USING (doc_id)
),
bands AS (
  SELECT doc_id, simhash, b AS band_idx,
         (simhash >> (b * {band_bits})) & {mask} AS band_val
  FROM sig, range(0, {n_bands}) t(b)
),
bg AS (
  SELECT band_idx, band_val FROM bands GROUP BY 1, 2
  HAVING COUNT(*) > 1 AND COUNT(*) <= {max_bucket}
),
pruned AS (SELECT bands.* FROM bands JOIN bg USING (band_idx, band_val))
SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM pruned a
JOIN pruned b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
 AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def kg_links_cosine_sql(
    blocking_threshold: float = 0.10,
    threshold: float = 0.50,
    dim: int = 64,
    k: int = 3,
) -> str:
    """Mirrors operators/embed.cosine_links_md5 over exact-Jaccard
    blocking: the ``expl`` CTE (links_cte) already holds each surface's
    distinct char k-grams, so the vector CTE reuses it — exactly what
    the Spark side's shared ``char_shingles`` guarantees."""
    return f"""
WITH {mentions_cte()}, {surfaces_cte()},
{links_cte(k=k, threshold=blocking_threshold)},
vec AS (
  SELECT sid, h % {dim} AS bucket,
         SUM(CASE WHEN (h >> 59) & 1 = 0 THEN 1 ELSE -1 END)::BIGINT AS v
  FROM (SELECT sid, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        FROM expl)
  GROUP BY sid, h % {dim}
),
nrm AS (SELECT sid, sqrt(SUM(v * v)) AS nrm FROM vec GROUP BY sid),
dots AS (
  SELECT l.src, l.dst, SUM(a.v * b.v)::BIGINT AS dot
  FROM links l
  JOIN vec a ON a.sid = l.src
  JOIN vec b ON b.sid = l.dst AND b.bucket = a.bucket
  GROUP BY l.src, l.dst
)
SELECT d.src, d.dst, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots d
JOIN nrm na ON na.sid = d.src
JOIN nrm nb ON nb.sid = d.dst
WHERE ROUND(d.dot / (na.nrm * nb.nrm), 6) >= {threshold}"""


def embedding_dups_sql(threshold: float = 0.40) -> str:
    """Mirrors operators/similarity.embedding_dup_pairs."""
    return f"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS src, b.vec_id AS dst,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}"""


ANN_QUERY_IDS = list(range(8))
ANN_TOPK = 5


def ann_topk_sql(query_ids=None, k: int = ANN_TOPK) -> str:
    """Mirrors operators/similarity.brute_force_topk."""
    ids = ", ".join(str(i) for i in (query_ids or ANN_QUERY_IDS))
    return f"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS sim
  FROM c q JOIN c ON q.vec_id IN ({ids}) AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim
FROM r WHERE rank <= {k}"""


def paragraph_dedup_sql(window_words: int = 10) -> str:
    """Mirrors operators/dedup.paragraph_dedup in window-words mode
    (the gate corpus has no layout newlines): global first-occurrence
    per paragraph, per-document reassembly in original order."""
    w = window_words
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
  FROM documents
),
seg AS (
  SELECT doc_id, i AS idx,
         array_to_string(w[(i*{w}+1):((i+1)*{w})], ' ') AS para
  FROM (SELECT doc_id, w,
               unnest(generate_series(
                 0, CAST(ceil(len(w) / {w}.0) AS INT) - 1)) AS i
        FROM d)
),
r AS (
  SELECT doc_id, idx, para,
         ROW_NUMBER() OVER (PARTITION BY para
                            ORDER BY doc_id, idx) AS rn
  FROM seg
)
SELECT doc_id,
       COALESCE(string_agg(para, ' ' ORDER BY idx)
                FILTER (WHERE rn = 1), '') AS text_clean,
       CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
FROM r GROUP BY doc_id"""


def ann_topk_blocked_sql(query_ids=None, k: int = ANN_TOPK) -> str:
    """Oracle for the merged blocked-ANN gate row: both variants (LSH,
    IVF) are exact-by-construction at gate settings, so each tag's
    rows equal the brute-force top-k."""
    base = ann_topk_sql(query_ids, k)
    return "\n UNION ALL \n".join(
        f"SELECT '{tag}' AS variant, * FROM ({base})"
        for tag in ("brute", "lsh", "ivf")
    )


def dedup_admit_sql(k: int = 3, threshold: float = 0.8) -> str:
    """Mirrors plans/incremental.dedup_admit_batch run as two batches
    (batch 1 = even doc_ids, batch 2 = odd) against a fresh store.

    The oracle world is EXACT Jaccard; the operator's verifier is the
    signature estimator Ĵ = |matching positions|/128. They agree
    deterministically on this corpus by the same margin argument the
    minhash row carries: seeded dups sit at J ≈ 0.99 (P[Ĵ < 0.8] means
    >25 of 128 positions mismatch at E[mismatch] ≈ 1.3 — vanishing),
    background pairs at J ≈ 0 (Ĵ ≥ 0.8 unreachable), and candidate
    recall is exact by PIGEONHOLE, not probability: Ĵ ≥ 0.8 leaves at
    most 25 mismatched positions, which can break at most 25 of the 32
    bands, so at least 7 whole bands collide. Store membership after
    batch 1 = its keepers; batch-2 suppression = min admitted match,
    else in-batch component min, with the one-hop keeper rewrite
    through a store-suppressed component min (r5 ADVICE)."""
    def cc(tag: str, parity: int) -> str:
        return f"""
p{tag} AS (SELECT src, dst FROM dup_pairs
           WHERE src % 2 = {parity} AND dst % 2 = {parity}),
sym{tag} AS (SELECT src AS a, dst AS b FROM p{tag}
             UNION SELECT dst, src FROM p{tag}),
reach{tag}(node, root) AS (
  SELECT DISTINCT a, a FROM sym{tag}
  UNION
  SELECT s.b, r.root FROM reach{tag} r JOIN sym{tag} s ON s.a = r.node
),
comp{tag} AS (SELECT node, MIN(root) AS component
              FROM reach{tag} GROUP BY node)"""

    return f"""WITH RECURSIVE {_ngram_pairs_cte(k, threshold)},
ids AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
{cc("1", 0)},
v1 AS (
  SELECT ids.doc_id,
         CASE WHEN comp1.component <> ids.doc_id
              THEN comp1.component END AS dup_of
  FROM ids LEFT JOIN comp1 ON comp1.node = ids.doc_id
  WHERE ids.doc_id % 2 = 0
),
store1 AS (SELECT doc_id FROM v1 WHERE dup_of IS NULL),
oldm AS (
  SELECT CASE WHEN src % 2 = 1 THEN src ELSE dst END AS doc_id,
         MIN(CASE WHEN src % 2 = 0 THEN src ELSE dst END) AS old_dup_of
  FROM dup_pairs
  WHERE (src % 2) <> (dst % 2)
    AND (CASE WHEN src % 2 = 0 THEN src ELSE dst END)
        IN (SELECT doc_id FROM store1)
  GROUP BY 1
),
{cc("2", 1)},
v2a AS (
  SELECT ids.doc_id,
         COALESCE(oldm.old_dup_of,
                  CASE WHEN comp2.component <> ids.doc_id
                       THEN comp2.component END) AS dup_of
  FROM ids
  LEFT JOIN oldm USING (doc_id)
  LEFT JOIN comp2 ON comp2.node = ids.doc_id
  WHERE ids.doc_id % 2 = 1
),
v2 AS (
  SELECT a.doc_id, COALESCE(t.dup_of, a.dup_of) AS dup_of
  FROM v2a a LEFT JOIN v2a t ON t.doc_id = a.dup_of
)
SELECT CAST(1 AS BIGINT) AS batch, doc_id, dup_of,
       dup_of IS NULL AS keep FROM v1
UNION ALL
SELECT CAST(2 AS BIGINT) AS batch, doc_id, dup_of,
       dup_of IS NULL AS keep FROM v2"""


def lm_score_sql(k_smooth: float = 0.5) -> str:
    """Mirrors operators/textstats.bigram_lm_scores."""
    k = float(k_smooth)
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
  FROM documents
),
bi AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
        FROM d)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       FROM bi GROUP BY 1, 2),
uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bi GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
      FROM (SELECT unnest(w) AS t FROM d)),
nll AS (
  SELECT bi.doc_id,
         -ln((bc.c12 + {k}) / (uc.c1 + {k} * v.v)) AS nll
  FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(AVG(nll), 4) AS avg_nll
  FROM nll GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       agg.avg_nll
FROM d LEFT JOIN agg USING (doc_id)"""


def token_stats_sql() -> str:
    """Mirrors operators/textstats.token_stats."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       ROUND(CAST(list_sum(list_transform(string_split(text, ' '),
                                          x -> length(x))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS avg_token_len
FROM documents"""


def bpe_token_stats_sql() -> str:
    """Mirrors operators/textstats.bpe_token_stats (shared BPE_PATTERN;
    the pattern stays inside the RE2 ∩ Java-regex subset)."""
    from .operators.textstats import BPE_PATTERN

    return f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_extract_all(text, '{BPE_PATTERN}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_bpe,
       CASE WHEN len(toks) > 0 THEN
         ROUND(CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks), 4)
       END AS avg_bpe_len
FROM t"""


def _sw_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def quality_sql() -> str:
    """Mirrors operators/textstats.quality_score."""
    from .operators.textstats import EN_STOPWORDS

    sw = _sw_list(EN_STOPWORDS)
    return f"""
WITH w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
  FROM documents
),
r AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(w, x -> list_contains({sw}, x))) AS DOUBLE)
           / len(w) AS stop_ratio,
         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio
  FROM w
)
SELECT doc_id, n_tokens,
       ROUND(stop_ratio, 4) AS stopword_ratio,
       ROUND(distinct_ratio, 4) AS distinct_ratio,
       ROUND(0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - abs(stop_ratio - 0.4))
             + 0.3 * distinct_ratio, 4) AS quality
FROM r"""


def lang_id_sql() -> str:
    """Mirrors operators/textstats.detect_language (argmax with
    profile-order tie-break)."""
    from .operators.textstats import LANG_PROFILES

    hits = ",\n         ".join(
        f"CAST(len(list_filter(w, x -> list_contains("
        f"{_sw_list(v)}, x))) AS BIGINT) AS {lang}_hits"
        for lang, v in LANG_PROFILES.items()
    )
    return f"""
WITH w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
  FROM documents
),
h AS (
  SELECT doc_id,
         {hits}
  FROM w
)
SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       CASE
         WHEN en_hits > 0 AND en_hits >= greatest(es_hits, de_hits, fr_hits)
           THEN 'en'
         WHEN es_hits > 0 AND es_hits >= greatest(de_hits, fr_hits) THEN 'es'
         WHEN de_hits > 0 AND de_hits >= fr_hits THEN 'de'
         WHEN fr_hits > 0 THEN 'fr'
         ELSE 'und'
       END AS pred_lang
FROM h"""


def length_quantiles_sql() -> str:
    """Mirrors operators/textstats.length_quantiles (quantile_cont uses
    the same SQL-standard linear interpolation as Spark's percentile)."""
    qs = ",\n       ".join(
        f"ROUND(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE),"
        f" {q}), 4) AS p{int(q * 100)}"
        for q in (0.25, 0.5, 0.75, 0.95)
    )
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {qs}
FROM documents GROUP BY lang"""


def _ppm_pixels_expr() -> str:
    """DuckDB expression reproducing attach_media's PPM pixel string:
    the text's ASCII bytes cycled to PPM_PIXEL_BYTES (empty text → ' ')."""
    from .operators.multimodal import PPM_PIXEL_BYTES

    base = "coalesce(nullif(text, ''), ' ')"
    return (
        f"substr(repeat({base}, CAST(ceil({PPM_PIXEL_BYTES}.0 / "
        f"length({base})) AS BIGINT)), 1, {PPM_PIXEL_BYTES})"
    )


def _media_cte() -> str:
    """CTE reproducing attach_media's payload strings (image = real P6
    PPM built from the same constants; audio/video = tagged text)."""
    from .operators.multimodal import PPM_H, PPM_W

    header = f"'P6' || chr(10) || '{PPM_W} {PPM_H}' || chr(10) || '255' || chr(10)"
    return f"""
m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS kind,
         text
  FROM documents
),
pay AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'image'
              THEN {header} || {_ppm_pixels_expr()}
              ELSE text || '|' || kind END AS mtxt
  FROM m
)"""


def mm_meta_sql() -> str:
    """Mirrors operators/multimodal.attach_media + media_metadata."""
    return f"""
WITH {_media_cte()}
SELECT doc_id, kind,
       CAST(octet_length(encode(mtxt)) AS BIGINT) AS n_bytes,
       sha256(mtxt) AS sha
FROM pay"""


def mm_features_sql() -> str:
    """Mirrors operators/multimodal.extract_features: integer moments
    over the DECODED payload — image rows over the PPM pixel plane
    (header stripped: the oracle recomputes the pixel string directly,
    so a decoder that mis-parses the header cannot match), audio/video
    over the raw payload bytes. Corpus text is pure ASCII (FIXTURES.md
    §5) so ``ord`` per char ≡ byte value."""
    from .operators.multimodal import PPM_H, PPM_PIXEL_BYTES, PPM_W

    n_ch = PPM_W * PPM_H
    return f"""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS kind,
         text
  FROM documents
),
ic AS (
  SELECT doc_id, kind,
         list_transform(generate_series(1, {PPM_PIXEL_BYTES}),
                        i -> ord(substr({_ppm_pixels_expr()}, i, 1))) AS codes
  FROM m WHERE kind = 'image'
),
irow AS (
  SELECT doc_id, kind,
         CAST({PPM_W} AS BIGINT) AS width, CAST({PPM_H} AS BIGINT) AS height,
         CAST(list_sum(list_transform(generate_series(0, {n_ch - 1}),
              i -> codes[3 * i + 1])) AS BIGINT) AS r_sum,
         CAST(list_sum(list_transform(generate_series(0, {n_ch - 1}),
              i -> codes[3 * i + 2])) AS BIGINT) AS g_sum,
         CAST(list_sum(list_transform(generate_series(0, {n_ch - 1}),
              i -> codes[3 * i + 3])) AS BIGINT) AS b_sum,
         CAST({PPM_PIXEL_BYTES} AS BIGINT) AS val_n,
         CAST(list_sum(codes) AS BIGINT) AS val_sum,
         CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT)
           AS val_sumsq
  FROM ic
),
ac AS (
  SELECT doc_id, kind, length(text || '|' || kind) AS n,
         list_transform(generate_series(1, length(text || '|' || kind)),
                        i -> ord(substr(text || '|' || kind, i, 1))) AS codes
  FROM m WHERE kind <> 'image'
),
arow AS (
  SELECT doc_id, kind,
         CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
         CAST(0 AS BIGINT) AS r_sum, CAST(0 AS BIGINT) AS g_sum,
         CAST(0 AS BIGINT) AS b_sum,
         CAST(n AS BIGINT) AS val_n,
         CAST(list_sum(codes) AS BIGINT) AS val_sum,
         CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT)
           AS val_sumsq
  FROM ac
)
SELECT * FROM irow UNION ALL SELECT * FROM arow"""


def mm_frames_sql(frame_bytes: int = 32, every_nth: int = 4) -> str:
    """Mirrors operators/multimodal.sample_frames over attach_media:
    video payloads (doc_id % 3 == 2) sliced into frame_bytes windows,
    every n-th kept; output is (doc_id, frame_idx, n_bytes)."""
    return f"""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(octet_length(encode(text || '|video')) AS BIGINT) AS nb
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT doc_id, nb,
         unnest(list_filter(
           generate_series(0, CAST(ceil(nb / {frame_bytes}.0) AS BIGINT) - 1),
           i -> i % {every_nth} = 0)) AS frame_idx
  FROM m
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(least({frame_bytes}, nb - frame_idx * {frame_bytes}) AS BIGINT)
         AS n_bytes
FROM f"""


STAGE_METRICS_VERSION = "token_stats/mod16/v3"
STAGE_METRICS_LINEAGE = {
    "input": "documents",
    "op": "token_stats",
    "version": STAGE_METRICS_VERSION,
}


def stage_metrics_sql(n_buckets: int = 16) -> str:
    """Mirrors the driver's q_stage_metrics manifest: one DONE row per
    ``doc_id % n_buckets`` bucket with the bucket's row count and the
    lineage JSON (json.dumps sort_keys=True — reproduced literally).
    The key-universe LEFT JOIN mirrors ``expected_part_keys``: buckets
    with zero rows still appear as DONE/0."""
    import json

    lineage = json.dumps(STAGE_METRICS_LINEAGE, sort_keys=True)
    return f"""
WITH counts AS (
  SELECT doc_id % {n_buckets} AS k, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY doc_id % {n_buckets}
),
keys AS (SELECT unnest(generate_series(0, {n_buckets - 1})) AS k)
SELECT 'token_stats' AS stage,
       CAST(keys.k AS VARCHAR) AS part_key,
       'done' AS status,
       CAST(COALESCE(counts.n_rows, 0) AS BIGINT) AS n_rows,
       '{lineage}' AS lineage
FROM keys LEFT JOIN counts USING (k)"""


# ---------------------------------------------------------------------------
# event analytics oracles (operators/events.py)
# ---------------------------------------------------------------------------

def sessionize_sql(gap_minutes: int = 30) -> str:
    """Mirrors operators/events.sessionize."""
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       ROUND(SUM(value), 4) AS total_value
FROM sessioned GROUP BY user_id, session_id"""


def hourly_rollup_sql() -> str:
    """Mirrors operators/events.hourly_rollup."""
    return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2"""


def top_users_sql(k: int = 3) -> str:
    """Mirrors operators/events.top_users_by_type."""
    return f"""
WITH per_user AS (
  SELECT event_type, user_id, ROUND(SUM(value), 4) AS total_value
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, total_value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY total_value DESC, user_id) AS rank
  FROM per_user
)
SELECT event_type, CAST(rank AS BIGINT) AS rank, user_id, total_value
FROM r WHERE rank <= {k}"""


def curate_sql(
    allowed_langs=("en",), min_quality: float = 0.5,
    near_dup_threshold: float = 0.8, k: int = 3,
) -> str:
    """Mirrors plans/curation.curate (lang gate + quality gate + exact/
    near dup suppression with recursive-CTE components)."""
    from .operators.textstats import EN_STOPWORDS, LANG_PROFILES

    langs_in = ", ".join(f"'{l}'" for l in allowed_langs)
    sw = _sw_list(EN_STOPWORDS)
    hits = ",\n         ".join(
        f"len(list_filter(w, x -> list_contains({_sw_list(v)}, x)))"
        f" AS {lang}_hits"
        for lang, v in LANG_PROFILES.items()
    )
    return f"""
WITH RECURSIVE
w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         string_split(text, ' ') AS w
  FROM documents
),
h AS (
  SELECT doc_id,
         {hits}
  FROM w
),
lang AS (
  SELECT doc_id,
         CASE
           WHEN en_hits > 0 AND en_hits >= greatest(es_hits, de_hits, fr_hits)
             THEN 'en'
           WHEN es_hits > 0 AND es_hits >= greatest(de_hits, fr_hits)
             THEN 'es'
           WHEN de_hits > 0 AND de_hits >= fr_hits THEN 'de'
           WHEN fr_hits > 0 THEN 'fr'
           ELSE 'und'
         END IN ({langs_in}) AS lang_ok
  FROM h
),
qr AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(w, x -> list_contains({sw}, x))) AS DOUBLE)
           / len(w) AS stop_ratio,
         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio
  FROM w
),
qual AS (
  SELECT doc_id,
         ROUND(0.4 * least(n_tokens / 50.0, 1.0)
               + 0.3 * (1.0 - abs(stop_ratio - 0.4))
               + 0.3 * distinct_ratio, 4) >= {min_quality} AS quality_ok
  FROM qr
),
eh AS (SELECT doc_id, md5(text) AS ch FROM w),
eg AS (SELECT ch, MIN(doc_id) AS keep_id FROM eh GROUP BY ch),
exact AS (
  SELECT eh.doc_id, eh.doc_id <> eg.keep_id AS is_exact_dup
  FROM eh JOIN eg USING (ch)
),
gsh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {k - 1}, 1)),
           i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))) AS g
  FROM w
),
ge AS (SELECT doc_id, len(g) AS n, unnest(g) AS s FROM gsh),
gp AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.n AS na, b.n AS nb,
         COUNT(*) AS inter
  FROM ge a JOIN ge b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
pairs AS (
  SELECT src, dst FROM gp
  WHERE ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6)
        >= {near_dup_threshold}
),
sym AS (
  SELECT src AS a, dst AS b FROM pairs
  UNION
  SELECT dst AS a, src AS b FROM pairs
),
reach(node, root) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (SELECT node, MIN(root) AS dup_group FROM reach GROUP BY node),
near AS (
  SELECT w.doc_id,
         comp.node IS NOT NULL AND comp.dup_group <> w.doc_id
           AS is_near_dup
  FROM w LEFT JOIN comp ON w.doc_id = comp.node
)
SELECT w.doc_id, lang.lang_ok, qual.quality_ok, exact.is_exact_dup,
       near.is_near_dup,
       lang.lang_ok AND qual.quality_ok AND NOT exact.is_exact_dup
         AND NOT near.is_near_dup AS keep
FROM w
JOIN lang USING (doc_id)
JOIN qual USING (doc_id)
JOIN exact USING (doc_id)
JOIN near USING (doc_id)"""


def sample_sql(rates=None, default_rate: float = 0.0) -> str:
    """Mirrors operators/sampling.sample_by_hash over documents."""
    from .operators.sampling import rate_to_hex

    rates = rates or {"en": 0.5, "es": 0.25}
    cases = " ".join(
        f"WHEN lang = '{k}' THEN '{rate_to_hex(r)}'" for k, r in rates.items()
    )
    return f"""
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < CASE {cases} ELSE '{rate_to_hex(default_rate)}' END"""


def mixture_sample_sql(
    alpha: float = 0.7,
    target_frac: float = 0.5,
    strata_col: str = "source",
) -> str:
    """Mirrors operators/sampling.mixture_sample over documents."""
    a, tf = float(alpha), float(target_frac)
    return f"""
WITH c AS (
  SELECT {strata_col}, CAST(COUNT(*) AS BIGINT) AS n_s
  FROM documents GROUP BY 1
),
t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
             SUM(pow(n_s, {a})) AS z FROM c),
r AS (
  SELECT {strata_col},
         LEAST(1.0, ROUND({tf} * t.n_total * pow(n_s, {a}) / t.z / n_s,
                          6)) AS rate
  FROM c CROSS JOIN t
),
rt AS (
  SELECT {strata_col}, rate,
         CASE WHEN rate >= 1.0 THEN 'gggggggg'
              ELSE lpad(lower(hex(CAST(floor(rate * 4294967296.0)
                                       AS BIGINT))), 8, '0')
         END AS thr
  FROM r
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.{strata_col}, rt.rate
FROM documents d JOIN rt USING ({strata_col})
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < rt.thr"""


def pack_shards_sql(token_budget: int = 2048,
                    part_col: str | None = "lang") -> str:
    """Mirrors operators/sampling.pack_shards. Default = the per-stratum
    (distributable) form: the cumulative-token window runs PER part_col
    partition, matching the plan that scales (a global window funnels
    the corpus through one task)."""
    part_select = f"{part_col} AS part,\n       " if part_col else ""
    part_by = f"PARTITION BY {part_col} " if part_col else ""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {part_select}CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(FLOOR(
         CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
             {part_by}ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS DOUBLE) / {token_budget}.0) AS BIGINT) AS shard_id
FROM documents"""
