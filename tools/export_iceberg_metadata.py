"""CLI: export Iceberg v2 metadata for a generation store's live
generation (VERDICT r9 #8).

Usage:
    python tools/export_iceberg_metadata.py <store_path>

Writes ``<store>/metadata/`` (table-metadata JSON, Avro manifest list,
Avro manifest, version-hint) describing the committed parquet files in
place. See wallet_and_risky_features_data_pipeline_spark/sources/iceberg_export.py
for the spec mapping and its documented limits.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wallet_and_risky_features_data_pipeline_spark.sources.iceberg_export import (
    export_iceberg_metadata,
)

if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    print(json.dumps(export_iceberg_metadata(sys.argv[1]), indent=1))
