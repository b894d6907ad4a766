"""Python user-defined table functions (Spark 4 UDTF API).

UDTFs are the PYTHON SLOW PATH — rows cross into a Python worker, so
nothing in this repo's hot paths uses one (tokenization, shingles,
spans are all JVM expressions; see operators/text.py, dedup.py). The
API still belongs in the engine's surface: it is the escape hatch for
row-to-rows logic that genuinely cannot be expressed with built-ins
(external parsers, stateful per-row generators), consumed via
`LATERAL` joins in SQL.

`token_spans` exists to pin the contract (registration, lateral join,
multi-row yield, arity) with something small and deterministic — the
JVM equivalent alongside it is what production code should use.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="start: int, length: int, token: string")
class TokenSpans:
    """(start offset, length, token) for each space-separated token."""

    def eval(self, text: str):  # noqa: ANN201 - UDTF contract
        pos = 0
        for tok in (text or "").split(" "):
            yield pos, len(tok), tok
            pos += len(tok) + 1


def register_udtfs(spark) -> None:
    spark.udtf.register("token_spans", TokenSpans)


def token_spans_jvm(df, text_col: str = "text"):
    """The JVM-side equivalent of TokenSpans — what a hot path should
    use (indexed transform + prefix-fold for offsets, one explode, no
    Python worker). The test pins both to identical output."""
    from pyspark.sql import functions as F

    spans = F.expr(
        f"""transform(split({text_col}, ' '), (t, i) -> struct(
              CAST(aggregate(slice(split({text_col}, ' '), 1, i), 0,
                   (acc, x) -> acc + length(x) + 1) AS INT) AS start,
              CAST(length(t) AS INT) AS length,
              t AS token))"""
    )
    return df.select(F.explode(spans).alias("s")).select(
        "s.start", "s.length", "s.token"
    )
