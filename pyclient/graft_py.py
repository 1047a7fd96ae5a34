"""graft_py -- Python-side transformer helper for graft's
ProcessTransformer contract.

This is the interop surface of the reference's Python SDK
(AbsaOSS/pramen: pramen-py/src/pramen_py/metastore/reader.py,
writer.py, runner/runner_transformation.py) re-expressed WITHOUT a
pyspark dependency: the Scala orchestrator owns Spark, partition
pruning and the metastore layout; the Python side sees plain parquet
directories and needs only the standard library plus pyarrow.

Contract (graft/pipeline/Transformer.scala, ProcessTransformer):

    <in>/<table>/   one parquet directory per declared input table,
                    already filtered to the run's info date
    <out>/          the transformer writes result parquet here; the
                    Scala side reads it back and lands it in the
                    metastore under the job's output table + info date

A transformer script is::

    import graft_py

    def transform(ms, info_date):
        t = ms.get_table("sales")              # pyarrow.Table
        ...                                    # any pyarrow/stdlib work
        return t                               # written to <out>/

    if __name__ == "__main__":
        graft_py.run_transformer(transform)

and is wired into a pipeline as::

    job.1.transformer = process
    job.1.option.process.command = python3 /path/to/script.py @in @out @infoDate
"""
import datetime
import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq


class MetastoreReader:
    """Read-side of the contract: the input tables staged under
    ``in_dir``, one parquet directory per table (mirror of pramen-py's
    MetastoreReader, scoped to the partitions the orchestrator already
    selected for this run)."""

    def __init__(self, in_dir):
        self._in = pathlib.Path(in_dir)
        if not self._in.is_dir():
            raise FileNotFoundError(f"graft_py: input dir does not exist: {in_dir}")

    def tables(self):
        """Names of the staged input tables."""
        return sorted(p.name for p in self._in.iterdir() if p.is_dir())

    def get_table(self, name):
        """The staged partition of ``name`` as a pyarrow.Table."""
        path = self._in / name
        if not path.is_dir():
            raise KeyError(
                f"graft_py: table '{name}' not staged; have: {self.tables()}")
        return pq.read_table(path)


class MetastoreWriter:
    """Write-side of the contract: one result table into ``out_dir``
    (mirror of pramen-py's MetastoreWriter; the Scala side owns the
    info-date column and partition placement)."""

    def __init__(self, out_dir):
        self._out = pathlib.Path(out_dir)

    def write(self, table):
        if not isinstance(table, pa.Table):
            raise TypeError(
                f"graft_py: transformer must return a pyarrow.Table, got {type(table)}")
        self._out.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, self._out / "part-00000.parquet")


def run_transformer(transform, argv=None):
    """CLI entry: ``script.py <in_dir> <out_dir> <info_date>`` --
    exactly the ``@in @out @infoDate`` substitution ProcessTransformer
    performs. Reads, transforms, writes; any exception exits non-zero
    so the Scala side fails the task with the captured output."""
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 3:
        print(f"usage: {sys.argv[0]} <in_dir> <out_dir> <info_date>", file=sys.stderr)
        raise SystemExit(2)
    in_dir, out_dir, info_date_str = args
    info_date = datetime.date.fromisoformat(info_date_str)
    reader = MetastoreReader(in_dir)
    result = transform(reader, info_date)
    MetastoreWriter(out_dir).write(result)
