"""CLI smoke tests — the mirror of the reference's whole test suite
(tests/test_cli.py:18-29: module entry point and group exit 0)."""

from __future__ import annotations

import pytest

import subprocess
import sys


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "bdc_collection_builder_spark", *args],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )


def test_module_entry_exits_zero():
    assert run_cli().returncode == 0


def test_help_exits_zero():
    assert run_cli("--help").returncode == 0


def test_list_queries():
    out = run_cli("list-queries")
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert len(lines) >= 100
    assert any(line.startswith("q1_pricing_summary") for line in lines)


@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_provider_admin_cli_flow(tmp_path):
    """Reference cli.py:44-175 parity: create-provider, load-providers,
    set-provider (incl. --disable/--remove) and overview against a
    fixture store, in ONE subprocess (one JVM boot, main() per
    command like the reference's CliRunner invocations)."""
    import json

    store = tmp_path / "cli_store"
    pfile = tmp_path / "nasa-usgs.json"
    pfile.write_text(json.dumps({
        "name": "USGS-M2M", "driver_name": "USGS",
        "url": "https://m2m.example",
        "credentials": {"username": "u", "password": "p"}}))
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from bdc_collection_builder_spark.__main__ import main, _engine_for
from bdc_collection_builder_spark.catalog.fixtures import make_fixtures

# seed the store with collections + providers fixtures once
engine, spark = _engine_for({str(store)!r})
fx = make_fixtures(spark, n_scenes=6, n_tiles=2)
for t in ("collections", "providers", "collection_providers"):
    engine.store.overwrite(t, fx[t])

rc = 0
rc |= main(["create-provider", "--store", {str(store)!r},
            "-n", "NEW-PROV", "--driver-name", "SciHub",
            "--username", "u", "--password", "p"])
# second create with same name: skipped, still exit 0
rc |= main(["create-provider", "--store", {str(store)!r},
            "-n", "NEW-PROV", "--driver-name", "SciHub",
            "--username", "u", "--password", "p"])
# missing credentials: exit 2
assert main(["create-provider", "--store", {str(store)!r},
             "-n", "X", "--driver-name", "Y"]) == 2
rc |= main(["load-providers", "--store", {str(store)!r},
            "--ifile", {str(pfile)!r}])
rc |= main(["set-provider", "--store", {str(store)!r},
            "-c", "1", "--provider", "NEW-PROV", "--priority", "0"])
rc |= main(["set-provider", "--store", {str(store)!r},
            "-c", "1", "--provider", "USGS-M2M", "--priority", "9",
            "--disable"])
rc |= main(["overview", "--store", {str(store)!r}, "-c", "1"])
rc |= main(["set-provider", "--store", {str(store)!r},
            "-c", "1", "--provider", "NEW-PROV", "--remove"])
sys.exit(rc)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Provider NEW-PROV created" in out.stdout
    assert "Provider NEW-PROV skipped." in out.stdout
    assert "Provider USGS-M2M created" in out.stdout
    # overview printed the provider order with NEW-PROV first (prio 0)
    prov_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith("  - ")]
    assert prov_lines and "NEW-PROV" in prov_lines[0]
    assert any("USGS-M2M" in ln and "active=False" in ln
               for ln in prov_lines)


@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_row_maintenance_cli_flow(tmp_path):
    """delete-rows / update-rows against a fixture items table, in one
    subprocess (same single-JVM pattern as the provider-admin test)."""
    import subprocess

    store = tmp_path / "cli_rows"
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from bdc_collection_builder_spark.__main__ import main, _engine_for
from bdc_collection_builder_spark.catalog.fixtures import make_fixtures

engine, spark = _engine_for({str(store)!r})
fx = make_fixtures(spark, n_scenes=12, n_tiles=2)
engine.store.overwrite("items", fx["items"])
n0 = engine.store.read("items").count()
n1 = engine.store.read("items").filter("collection_id = 1").count()
assert 0 < n1 < n0

rc = 0
rc |= main(["update-rows", "--store", {str(store)!r}, "-t", "items",
            "-w", "collection_id = 1", "--set", "cloud_cover=55.5"])
engine, spark = _engine_for({str(store)!r})  # handlers stop the session
got = engine.store.read("items")
assert got.filter("collection_id = 1 AND cloud_cover <> 55.5").count() == 0
assert got.count() == n0

rc |= main(["delete-rows", "--store", {str(store)!r}, "-t", "items",
            "-w", "collection_id = 1"])
engine, spark = _engine_for({str(store)!r})
got = engine.store.read("items")
assert got.count() == n0 - n1
assert got.filter("collection_id = 1").count() == 0

# malformed --set exits 2
assert main(["update-rows", "--store", {str(store)!r}, "-t", "items",
             "-w", "TRUE", "--set", "nonsense"]) == 2
sys.exit(rc)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Deleted" in out.stdout and "Updated items" in out.stdout


@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_constraints_cli_flow(tmp_path):
    """set-constraints / show-constraints: declaration with FK parse,
    enforcement visible through delete-rows (RESTRICT blocks, cascade
    propagates), and rejection of a declaration over violating rows —
    the store-admin face of the reference's alembic-managed schema."""
    import subprocess

    store = tmp_path / "cli_cons"
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from bdc_collection_builder_spark.__main__ import main, _engine_for
from bdc_collection_builder_spark.catalog.fixtures import make_fixtures

engine, spark = _engine_for({str(store)!r})
fx = make_fixtures(spark, n_scenes=8, n_tiles=2)
for t in ("collections", "providers", "collection_providers",
          "activities"):
    engine.store.overwrite(t, fx[t])
spark.stop()

rc = 0
rc |= main(["set-constraints", "--store", {str(store)!r},
            "-t", "activities",
            "--not-null", "sceneid",
            "--fk", "collection_id->collections.id"])
rc |= main(["set-constraints", "--store", {str(store)!r},
            "-t", "collection_providers",
            "--fk", "provider_id->providers.id:cascade"])
rc |= main(["show-constraints", "--store", {str(store)!r},
            "-t", "activities"])
# RESTRICT: deleting a referenced collection must exit nonzero and
# leave the table intact (delete-rows surfaces the violation)
engine, spark = _engine_for({str(store)!r})
cid = engine.store.read("activities").select("collection_id").first()[0]
n_cols = engine.store.read("collections").count()
spark.stop()
assert main(["delete-rows", "--store", {str(store)!r},
             "-t", "collections", "-w", f"id = {{cid}}"]) == 1
engine, spark = _engine_for({str(store)!r})
assert engine.store.read("collections").count() == n_cols
pid = engine.store.read("collection_providers").select(
    "provider_id").first()[0]
spark.stop()
# CASCADE: deleting a provider removes its collection_providers rows
rc |= main(["delete-rows", "--store", {str(store)!r}, "-t", "providers",
            "-w", f"id = {{pid}}"])
engine, spark = _engine_for({str(store)!r})
assert engine.store.read("collection_providers").filter(
    f"provider_id = {{pid}}").count() == 0
# declaring over violating rows exits 1 (existing-rows validation)
bad = engine.store.read("activities").limit(1).selectExpr(
    "id + 1000000 as id", "999 as collection_id", "activity_type",
    "concat(sceneid, '-bad') as sceneid", "scene_type", "tags",
    "args", "created", "updated")
engine.store.drop_constraints("activities")
engine.store.merge_upsert("activities", bad)
spark.stop()
assert main(["set-constraints", "--store", {str(store)!r},
             "-t", "activities",
             "--fk", "collection_id->collections.id"]) == 1
# malformed --fk exits 2
assert main(["set-constraints", "--store", {str(store)!r},
             "-t", "activities", "--fk", "nonsense"]) == 2
sys.exit(rc)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600,
                         cwd="/root/repo")
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "Constraints set on activities" in out.stdout
    assert '"ref_table": "collections"' in out.stdout


@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_delete_keys_cli(tmp_path):
    """delete-keys: erase rows whose key tuples come from a parquet
    file — the anti-join MERGE admin command (same single-JVM
    subprocess pattern)."""
    import subprocess

    store = tmp_path / "cli_dk"
    keys_pq = tmp_path / "doomed_keys"
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from bdc_collection_builder_spark.__main__ import main, _engine_for
from bdc_collection_builder_spark.catalog.fixtures import make_fixtures

engine, spark = _engine_for({str(store)!r})
fx = make_fixtures(spark, n_scenes=12, n_tiles=2)
engine.store.overwrite("items", fx["items"])
n0 = engine.store.read("items").count()
victims = fx["items"].limit(4).select("name", "collection_id")
nv = victims.count()
victims.write.mode("overwrite").parquet({str(keys_pq)!r})

rc = main(["delete-keys", "--store", {str(store)!r}, "-t", "items",
           "--keys", {str(keys_pq)!r},
           "--key-cols", "name,collection_id"])
engine, spark = _engine_for({str(store)!r})
got = engine.store.read("items")
assert got.count() == n0 - nv
assert got.join(spark.read.parquet({str(keys_pq)!r}),
                ["name", "collection_id"]).count() == 0
# default key columns = the table's merge keys (same columns here)
rc |= main(["delete-keys", "--store", {str(store)!r}, "-t", "items",
            "--keys", {str(keys_pq)!r}])  # idempotent no-op
engine, spark = _engine_for({str(store)!r})
assert engine.store.read("items").count() == n0 - nv
sys.exit(rc)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"Deleted 4 row(s)" in out.stdout
    assert f"Deleted 0 row(s)" in out.stdout


@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_vacuum_cli(tmp_path):
    """vacuum: expire snapshots from the prompt (erasure completion)."""
    import subprocess

    store = tmp_path / "cli_vac"
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from bdc_collection_builder_spark.__main__ import main, _engine_for
from bdc_collection_builder_spark.catalog.fixtures import make_fixtures

engine, spark = _engine_for({str(store)!r})
fx = make_fixtures(spark, n_scenes=10, n_tiles=2)
engine.store.overwrite("items", fx["items"])
engine.store.overwrite("items", fx["items"])
assert len(engine.store.snapshots("items")) >= 2

rc = main(["vacuum", "--store", {str(store)!r}, "-t", "items"])
engine, spark = _engine_for({str(store)!r})
assert len(engine.store.snapshots("items")) == 1
assert main(["vacuum", "--store", {str(store)!r}, "-t", "items",
             "--keep-last", "0"]) == 2
sys.exit(rc)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Vacuumed" in out.stdout
