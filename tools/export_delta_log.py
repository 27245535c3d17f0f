"""CLI: export a Delta transaction log for a generation store's
committed history (the Iceberg export's sibling).

Usage:
    python tools/export_delta_log.py <store_path>

Writes ``<store>/_delta_log/`` mapping generations onto Delta versions
(oldest = version 0, each later generation = one overwrite commit).
See wallet_and_risky_features_data_pipeline_spark/sources/delta_export.py for
the protocol mapping and its documented limits.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wallet_and_risky_features_data_pipeline_spark.sources.delta_export import (
    export_delta_log,
)

if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    print(json.dumps(export_delta_log(sys.argv[1]), indent=1))
