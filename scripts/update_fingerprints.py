"""Regenerate QUERY_FINGERPRINTS.json.

Run ONLY immediately after a clean full ``scripts/driver_sim.py`` pass
(every catalog query locally verified against its DuckDB oracle): the file
asserts "this exact code was differentially verified". At catalog import, a
query whose current fingerprint differs from its recorded one is treated as
changed-since-verified and re-prioritized into the driver's verification
window even if its last CORRECTNESS row was green — a green row earned by
different code is stale. For a green driver row known to predate the code
that ships, use ``register(..., reverify=True)`` instead (fingerprints
can't see changes that happened before the last regeneration).
"""

from __future__ import annotations

import json
import pathlib

from data_management_service_run_etl_imputations_spark import catalog
from data_management_service_run_etl_imputations_spark.queries import REGISTRY

OUT = pathlib.Path(__file__).resolve().parent.parent / "QUERY_FINGERPRINTS.json"


def main() -> None:
    fps = {name: catalog.query_fingerprint(q) for name, q in sorted(REGISTRY.items())}
    OUT.write_text(json.dumps(fps, indent=2, sort_keys=True) + "\n")
    print(f"wrote {len(fps)} fingerprints to {OUT}")


if __name__ == "__main__":
    main()
