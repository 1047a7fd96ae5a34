"""Example graft_py transformer: project (doc_id, n_chars) from the
staged `documents` table and add a computed n2 = n_chars * 2 column --
the e2e shape the ProcessTransformerPySpec and the q_py_transform gate
replay against a DuckDB oracle."""
import pyarrow as pa
import pyarrow.compute as pc

import graft_py


def transform(ms, info_date):
    docs = ms.get_table("docs_py")
    return pa.table({
        "doc_id": docs.column("doc_id"),
        "n_chars": docs.column("n_chars"),
        "n2": pc.multiply(docs.column("n_chars"), pa.scalar(2, pa.int64())),
    })


if __name__ == "__main__":
    graft_py.run_transformer(transform)
