"""User-facing facade — the one-import surface a user of the reference
switches to.

    from query_processing_over_streaming_data_using_flink_spark.api import Engine

    eng = Engine(data_dir="/root/testdata/sf0.1")   # builds a tuned session
    eng.query("q3_shipping_priority").show()        # any registered operator
    eng.sql("SELECT count(*) FROM lineitem").show() # ad-hoc SQL over the catalog
    eng.names()                                     # everything available

Thin by design: queries live in the registry (`registry.py`), table
loading in the catalog (`sources/catalog.py`), session tuning in
`session.py` — this just wires them together and pins the data
directory so call sites stay one-liners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from query_processing_over_streaming_data_using_flink_spark import registry
from query_processing_over_streaming_data_using_flink_spark.session import get_spark
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)


class Engine:
    """A SparkSession bound to a data directory, with every registered
    operator callable by name."""

    def __init__(
        self, data_dir: str, spark: SparkSession | None = None, app_name: str = "spark-streamq"
    ) -> None:
        self.data_dir = data_dir
        self.spark = spark if spark is not None else get_spark(app_name)
        self._views_registered = False

    # -- queries -------------------------------------------------------------

    def names(self) -> list[str]:
        """All registered operator/query names."""
        return list(registry.all_queries())

    def query(self, name: str) -> DataFrame:
        """Run a registered operator against this engine's data dir."""
        fns = registry.all_queries()
        if name not in fns:
            import difflib

            hint = difflib.get_close_matches(name, fns, n=3)
            raise KeyError(f"unknown query {name!r}" + (f"; did you mean {hint}?" if hint else ""))
        return fns[name](self.spark, self.data_dir)

    def oracle_sql(self, name: str) -> str | None:
        """The DuckDB oracle SQL for a registered query (None if the
        operator is not SQL-expressible)."""
        return registry.all_oracles().get(name)

    # -- ad-hoc --------------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        """Load a catalog table from the data dir."""
        return load_table(self.spark, self.data_dir, name)

    def sql(self, query: str) -> DataFrame:
        """Ad-hoc Spark SQL with every catalog table registered as a
        temp view (idempotent)."""
        if not self._views_registered:
            register_views(self.spark, self.data_dir, TABLES)
            self._views_registered = True
        return self.spark.sql(query)

    # -- streaming -----------------------------------------------------------

    def stream_q3(
        self, changelog_dir: str, state_dir: str, **kwargs
    ) -> DataFrame:
        """Consume a parquet changelog directory and maintain TPC-H Q3
        incrementally (the reference's flagship pipeline); returns the
        final Top-N. See `streaming.ivm.run_streaming_q3` for
        checkpointing / compaction / progress options."""
        from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import (
            run_streaming_q3,
        )

        return run_streaming_q3(self.spark, changelog_dir, state_dir, **kwargs)

    def stream_rollup(
        self, changelog_dir: str, state_dir: str, **kwargs
    ) -> DataFrame:
        """Maintain the monthly revenue rollup (continuous aggregate)
        over a parquet changelog directory; returns the final view. See
        `streaming.incragg.run_streaming_rollup`."""
        from query_processing_over_streaming_data_using_flink_spark.streaming.incragg import (
            run_streaming_rollup,
        )

        return run_streaming_rollup(self.spark, changelog_dir, state_dir, **kwargs)
