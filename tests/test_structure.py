"""Structure detector/chunker semantics on hand-written documents
(detector.rs / chunker.rs behavior: fences kept whole, tables split
between rows with header propagation, heading context carried)."""

from memvid_spark.operators.structure import (
    detect_structure,
    lines_from_text,
    structural_chunks,
)

DOC = """# Title
intro paragraph
## Data
| a | b |
| 1 | 2 |
| 3 | 4 |
| 5 | 6 |
```
code line 1
code line 2
```
closing words"""


def test_detect_structure_blocks(spark):
    docs = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    blocks = {
        (r.kind, r.block_start): r
        for r in detect_structure(lines_from_text(docs)).collect()
    }
    assert blocks[("table", 3)].n_lines == 4
    assert blocks[("code", 7)].n_lines == 4  # fences included
    assert blocks[("code", 7)].content.startswith("```")
    assert blocks[("para", 11)].heading_ctx == "## Data"
    assert blocks[("heading", 0)].content == "# Title"


def test_chunker_splits_tables_with_header(spark):
    docs = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    blocks = detect_structure(lines_from_text(docs))
    chunks = structural_chunks(blocks, max_table_rows=2).collect()
    table = sorted(
        [c for c in chunks if c.kind == "table"], key=lambda c: c.chunk_index
    )
    assert len(table) == 2  # 3 data rows / 2 per chunk
    assert all(c.chunk_text.startswith("| a | b |") for c in table)
    assert "| 5 | 6 |" in table[1].chunk_text
    # code block never split
    code = [c for c in chunks if c.kind == "code"]
    assert len(code) == 1 and "code line 2" in code[0].chunk_text
