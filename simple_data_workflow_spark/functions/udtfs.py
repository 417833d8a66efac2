"""User-defined table function (UDTF) surface — the third leg of the
extension triple (scalar pandas UDFs in ``functions.vectors``, GROUPED_AGG
UDAFs in ``functions.aggregates``).

Python UDTFs (Spark 4) are row-at-a-time generators — the SLOW path.
The engine's stance stands: set-returning logic belongs in codegen
``explode``/``posexplode``/``sequence`` (see ``llmdata.text.chunk_documents``)
or Arrow-batched ``mapInPandas`` when Python is unavoidable. This module
exists so a user porting a UDTF-shaped workflow has the API demonstrated
with its cost documented, not because any hot path should use one.
"""

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """Yield (position, sentence) rows from a text column — the lateral
    table-function shape: ``SELECT d.doc_id, s.pos, s.sentence FROM docs d,
    LATERAL split_sentences(d.text) s``. Row-at-a-time Python; prefer
    ``posexplode(split(...))`` (bit-identical output, JVM-side) anywhere
    volume matters."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            if s:
                yield i, s


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL lateral use."""
    spark.udtf.register("split_sentences", SplitSentences)
