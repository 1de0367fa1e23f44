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
