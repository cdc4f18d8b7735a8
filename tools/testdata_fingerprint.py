"""Record the driver-generated testdata's parquet layout per round.

The r17 `agg_pricing_summary` floor elevation (1.55 -> 2.00 with zero
source change) could not be bisected because nothing recorded what the
testdata parquet layout WAS in r17 — the driver regenerates
/root/testdata each round, and row-group count is the scan-parallelism
unit (a single 600k-row row group means the scan + partial aggregate
run as ONE task regardless of local[32]).  This tool dumps a layout
fingerprint (rows / row groups / compressed size / column count per
table per sf) so the next unexplained floor move can be diffed against
the committed fingerprint instead of guessed at.

Usage: python tools/testdata_fingerprint.py > TESTDATA_LAYOUT_r{N}.json
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq


def main() -> None:
    out: dict[str, dict[str, dict[str, int]]] = {}
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        sf = os.path.basename(sf_dir)
        out[sf] = {}
        for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            meta = pq.ParquetFile(path).metadata
            out[sf][os.path.basename(path)] = {
                "rows": meta.num_rows,
                "row_groups": meta.num_row_groups,
                "columns": meta.num_columns,
                "bytes": os.path.getsize(path),
            }
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
