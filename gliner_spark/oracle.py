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
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY ord) AS next_w
  FROM toks
),
men AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(s AS BIGINT) AS m_start,
         CAST(s + length(w) AS BIGINT) AS m_end,
         w AS m_text, label, CAST(prob AS DOUBLE) AS prob
  FROM pos JOIN gaz_single ON pos.w = gaz_single.term
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


def kg_edges_sql() -> str:
    return f"""WITH base AS ({ner_triples_sql()})
SELECT subj, subj_label, pred, obj, obj_label,
       COUNT(*) AS support, ROUND(MAX(prob), 4) AS max_prob
FROM base GROUP BY subj, subj_label, pred, obj, obj_label"""
