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



def _strip_stale_spark_metadata(table):
    """Drop Spark's schema metadata before writing. A table read from
    Spark-written parquet carries ``org.apache.spark.sql.parquet.row
    .metadata`` describing the ORIGINAL columns; pyarrow preserves it
    through transforms, and Spark's reader trusts it over the physical
    footer schema — so a transformer-added column would be silently
    dropped on the Scala side (observed: an appended column invisible
    to spark.read)."""
    md = table.schema.metadata or {}
    clean = {k: v for k, v in md.items()
             if not k.startswith(b"org.apache.spark")}
    return table.replace_schema_metadata(clean or None)


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
        pq.write_table(_strip_stale_spark_metadata(table),
                       self._out / "part-00000.parquet")


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


# ---------------------------------------------------------------------------
# Standalone runner — the `pramen-py transformations run` UX
# (reference: pramen-py/src/pramen_py/app/cli.py,
# runner/runner_transformation.py, models/__init__.py), re-expressed
# over the stdlib + pyarrow: no Spark on the Python side, transformers
# read/write the metastore's partition layout directly.
#
#     python3 graft_py.py ls --transformations-dir ./transformations
#     python3 graft_py.py run ExampleTransformation1 \
#         --config config.yaml --info-date 2024-07-01 \
#         --transformations-dir ./transformations
#
# Config shape follows the reference's real_config.yaml:
#
#     run_transformers:
#     - info_date: 2022-02-14
#       output_table: table_out1
#       name: ExampleTransformation1
#       options: {}
#     metastore_tables:
#     - name: table1_sync
#       format: parquet
#       info_date_settings:
#         column: info_date
#         format: yyyy-MM-dd
#       path: /data/table1
#       records_per_partition: 1000000


class Transformation:
    """Base class for standalone transformations (mirror of
    pramen-py's ``Transformation``): subclass and implement ``run``.

        class MyTransformation(graft_py.Transformation):
            def run(self, metastore, info_date, options):
                t = metastore.get_table("table1_sync", info_date)
                return t  # pyarrow.Table, written to the output table
    """

    def run(self, metastore, info_date, options):
        raise NotImplementedError

    @classmethod
    def discovered(cls):
        """All currently imported subclasses, by class name (the
        reference discovers via ``__subclasses__`` the same way)."""
        seen = {}
        stack = list(cls.__subclasses__())
        while stack:
            sub = stack.pop()
            seen.setdefault(sub.__name__, sub)
            stack.extend(sub.__subclasses__())
        return seen


def _parse_scalar(s):
    s = s.strip()
    if s in ("{}",):
        return {}
    if s in ("[]",):
        return []
    if s in ("null", "~", ""):
        return None
    if s in ("true", "True"):
        return True
    if s in ("false", "False"):
        return False
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def load_config(path):
    """Minimal YAML-subset loader for the runner config: block
    mappings and lists of mappings by indentation, inline ``{}``/
    ``[]``, full-line comments, scalars. This is the subset the
    reference's documented config uses; anything fancier (anchors,
    multi-line strings, flow collections) raises."""
    lines = []
    with open(path, "r", encoding="utf-8") as f:
        for raw in f.read().splitlines():
            stripped = raw.strip()
            if not stripped or stripped.startswith("#"):
                continue
            for bad in ("&", "*", ">", "|"):
                if stripped.startswith(bad):
                    raise ValueError(f"graft_py config: unsupported YAML feature: {raw!r}")
            lines.append(raw)

    def parse_block(i, indent):
        """Parse the mapping or list whose lines sit at exactly
        `indent`; returns (obj, next_i)."""
        if i >= len(lines):
            return {}, i
        if lines[i].lstrip().startswith("- "):
            out = []
            while i < len(lines):
                ind = len(lines[i]) - len(lines[i].lstrip(" "))
                item = lines[i].lstrip()
                if ind != indent or not item.startswith("- "):
                    break
                # a list item opens a mapping whose first key is inline;
                # its keys sit at the item's content column ("- " = 2)
                inner_indent = ind + 2
                rest = item[2:]
                if ":" in rest:
                    # rewrite the inline first key as a normal mapping line
                    lines[i] = " " * inner_indent + rest
                    obj, i = parse_mapping(i, inner_indent)
                    out.append(obj)
                else:
                    out.append(_parse_scalar(rest))
                    i += 1
            return out, i
        return parse_mapping(i, indent)

    def parse_mapping(i, indent):
        out = {}
        while i < len(lines):
            ind = len(lines[i]) - len(lines[i].lstrip(" "))
            item = lines[i].lstrip()
            if ind < indent or item.startswith("- "):
                break
            if ind > indent:
                raise ValueError(f"graft_py config: bad indentation: {lines[i]!r}")
            if ":" not in item:
                raise ValueError(f"graft_py config: expected 'key: value': {lines[i]!r}")
            key, _, val = item.partition(":")
            key = key.strip()
            val = val.strip()
            if val:
                out[key] = _parse_scalar(val)
                i += 1
            else:
                # nested block (mapping or list) — or an empty value.
                # List items may sit at the SAME indent as their key
                # (the reference config's top-level style) or deeper.
                if i + 1 < len(lines):
                    nxt_ind = len(lines[i + 1]) - len(lines[i + 1].lstrip(" "))
                    nxt = lines[i + 1].lstrip()
                    if nxt_ind > ind or (nxt_ind >= ind and nxt.startswith("- ")):
                        out[key], i = parse_block(i + 1, nxt_ind)
                        continue
                out[key] = None
                i += 1
        return out, i

    obj, i = parse_block(0, 0)
    if i != len(lines):
        raise ValueError(f"graft_py config: trailing content at line: {lines[i]!r}")
    return obj


class PartitionedMetastore:
    """Read/write the metastore's day-partitioned parquet layout
    (``<path>/<info_date_column>=<date>/``) from table configs —
    the standalone runner's equivalent of pramen-py's
    MetastoreReader/MetastoreWriter pair."""

    def __init__(self, tables):
        self._tables = {t["name"]: t for t in tables}
        for t in self._tables.values():
            fmt = t.get("format", "parquet")
            if fmt != "parquet":
                raise ValueError(
                    f"graft_py: table '{t['name']}' format '{fmt}' not supported "
                    "by the standalone runner (parquet only)")
            ids = t.get("info_date_settings") or {}
            date_fmt = ids.get("format", "yyyy-MM-dd")
            if date_fmt != "yyyy-MM-dd":
                raise ValueError(
                    f"graft_py: table '{t['name']}' info date format '{date_fmt}' "
                    "not supported (yyyy-MM-dd only)")

    def _conf(self, name):
        if name not in self._tables:
            raise KeyError(
                f"graft_py: table '{name}' not in metastore config; "
                f"have: {sorted(self._tables)}")
        return self._tables[name]

    def _date_col(self, conf):
        return (conf.get("info_date_settings") or {}).get("column", "info_date")

    def _partition_dir(self, name, info_date):
        conf = self._conf(name)
        return pathlib.Path(conf["path"]) / f"{self._date_col(conf)}={info_date}"

    def partitions(self, name):
        """Available info dates, ascending."""
        conf = self._conf(name)
        prefix = self._date_col(conf) + "="
        root = pathlib.Path(conf["path"])
        if not root.is_dir():
            return []
        out = []
        for p in root.iterdir():
            if p.is_dir() and p.name.startswith(prefix):
                try:
                    out.append(datetime.date.fromisoformat(p.name[len(prefix):]))
                except ValueError:
                    pass
        return sorted(out)

    def get_table(self, name, info_date):
        """One partition of ``name`` as a pyarrow.Table."""
        d = self._partition_dir(name, info_date)
        if not d.is_dir():
            raise KeyError(
                f"graft_py: no partition {d.name} for table '{name}' "
                f"(available: {[str(x) for x in self.partitions(name)]})")
        return pq.read_table(d)

    def get_latest(self, name, until=None):
        """The newest partition at or before ``until`` (default: any)."""
        cands = [p for p in self.partitions(name) if until is None or p <= until]
        if not cands:
            raise KeyError(f"graft_py: table '{name}' has no partition <= {until}")
        return self.get_table(name, cands[-1])

    def write(self, name, table, info_date):
        """Overwrite one partition of ``name``, honoring the table's
        ``records_per_partition`` chunking."""
        if not isinstance(table, pa.Table):
            raise TypeError(
                f"graft_py: transformation must return a pyarrow.Table, got {type(table)}")
        conf = self._conf(name)
        d = self._partition_dir(name, info_date)
        if d.is_dir():
            for f in sorted(d.iterdir()):
                f.unlink()
        d.mkdir(parents=True, exist_ok=True)
        per = int(conf.get("records_per_partition", 500000) or 500000)
        table = _strip_stale_spark_metadata(table)
        n = table.num_rows
        chunks = max(1, -(-n // per)) if n else 1
        for i in range(chunks):
            pq.write_table(table.slice(i * per, per), d / f"part-{i:05d}.parquet")


def load_transformations(directory):
    """Import every ``*.py`` module under ``directory`` (recursively,
    skipping ``_``-prefixed files) so Transformation subclasses
    register — the reference's namespace-package discovery, filesystem
    flavored."""
    import importlib.util
    root = pathlib.Path(directory)
    if not root.is_dir():
        raise FileNotFoundError(f"graft_py: transformations dir not found: {directory}")
    for py in sorted(root.rglob("*.py")):
        if py.name.startswith("_"):
            continue
        spec = importlib.util.spec_from_file_location(
            "graft_py_tf_" + py.stem, py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)


def run_named(name, config, info_date=None):
    """Run every ``run_transformers`` entry for transformation
    ``name``; ``info_date`` (a ``datetime.date``) overrides the
    config's dates, like the reference's ``--info-date``. Returns the
    number of entries executed."""
    entries = [e for e in (config.get("run_transformers") or []) if e.get("name") == name]
    if not entries:
        raise KeyError(
            f"graft_py: no run_transformers entry for '{name}' in config")
    classes = Transformation.discovered()
    if name not in classes:
        raise KeyError(
            f"graft_py: transformation class '{name}' not found; "
            f"discovered: {sorted(classes)}")
    ms = PartitionedMetastore(config.get("metastore_tables") or [])
    ran = 0
    for entry in entries:
        date = info_date or datetime.date.fromisoformat(str(entry["info_date"]))
        out_table = entry["output_table"]
        options = entry.get("options") or {}
        result = classes[name]().run(ms, date, options)
        ms.write(out_table, result, date)
        ran += 1
    return ran


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    if not args or args[0] in ("-h", "--help"):
        print("usage: graft_py.py ls [--transformations-dir D]\n"
              "       graft_py.py run <Name> --config C [--info-date YYYY-MM-DD]\n"
              "                   [--transformations-dir D]", file=sys.stderr)
        raise SystemExit(0 if args else 2)
    cmd, rest = args[0], args[1:]
    opts = {"--transformations-dir": "./transformations"}
    positional = []
    i = 0
    while i < len(rest):
        if rest[i].startswith("--"):
            if i + 1 >= len(rest):
                raise SystemExit(f"graft_py: missing value for {rest[i]}")
            opts[rest[i]] = rest[i + 1]
            i += 2
        else:
            positional.append(rest[i])
            i += 1
    if cmd == "ls":
        if pathlib.Path(opts["--transformations-dir"]).is_dir():
            load_transformations(opts["--transformations-dir"])
        for name in sorted(Transformation.discovered()):
            print(name)
        return
    if cmd == "run":
        if len(positional) != 1:
            raise SystemExit("graft_py: run takes exactly one transformation name")
        if "--config" not in opts:
            raise SystemExit("graft_py: run requires --config")
        load_transformations(opts["--transformations-dir"])
        config = load_config(opts["--config"])
        info_date = (datetime.date.fromisoformat(opts["--info-date"])
                     if "--info-date" in opts else None)
        n = run_named(positional[0], config, info_date)
        print(f"graft_py: ran {n} entr{'y' if n == 1 else 'ies'} of {positional[0]}")
        return
    raise SystemExit(f"graft_py: unknown command '{cmd}'")


if __name__ == "__main__":
    # running as a script makes this module "__main__"; transformation
    # modules `import graft_py`, which would otherwise load a SECOND
    # copy whose Transformation base class is a different object —
    # subclass discovery would come back empty. Alias first.
    sys.modules.setdefault("graft_py", sys.modules["__main__"])
    main()
