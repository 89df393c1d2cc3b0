#!/usr/bin/env python3
"""Registry-integrity guard (VERDICT r10 #4): assert every query name in
the frozen manifest still imports and registers.

The failure mode this guards: a code move / insertion that displaces a
``@register`` decorator onto the wrong ``def`` silently DROPS a query
from the registry (the decorator-stacking footgun — it has happened).
Run after ANY edit to bob_vector_db_spark/queries/:

    python tools/check_registry.py            # assert vs the manifest
    python tools/check_registry.py --freeze   # re-freeze after ADDING queries

The manifest only ever GROWS: freezing refuses to drop names.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "registry_manifest.json")


def main() -> int:
    from bob_vector_db_spark.queries import REGISTRY, oracle_sql, queries

    names = sorted(REGISTRY)
    oracles = oracle_sql()
    runnable = queries()
    assert set(runnable) == set(names), "queries() lost names vs REGISTRY"
    assert set(oracles) <= set(names), "oracle_sql() has unregistered names"

    if "--freeze" in sys.argv:
        if os.path.exists(MANIFEST):
            old = set(json.load(open(MANIFEST))["names"])
            gone = sorted(old - set(names))
            if gone:
                print(f"REFUSED: freezing would drop {len(gone)} names: "
                      f"{gone}")
                return 1
        json.dump({"names": names, "oracled": sorted(oracles),
                   "n_oracled": len(oracles)},
                  open(MANIFEST, "w"), indent=1)
        print(f"froze {len(names)} names ({len(oracles)} oracled)")
        return 0

    want = json.load(open(MANIFEST))
    missing = sorted(set(want["names"]) - set(names))
    if missing:
        print(f"FAIL: {len(missing)} promised queries missing from the "
              f"registry (decorator displaced?): {missing}")
        return 1
    # a displaced spec can also keep the NAME but lose its ORACLE
    # (re-registering with oracle=None) — the frozen oracled list
    # catches the silent downgrade to a rows-only check
    lost = sorted(set(want.get("oracled", [])) - set(oracles))
    if lost:
        print(f"FAIL: {len(lost)} queries lost their DuckDB oracle "
              f"(spec displaced?): {lost}")
        return 1
    extra = sorted(set(names) - set(want["names"]))
    print(f"OK: all {len(want['names'])} manifest names registered"
          + (f"; {len(extra)} new unfrozen: {extra}" if extra else ""))
    if extra:
        print("  (run tools/check_registry.py --freeze to pin them)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
