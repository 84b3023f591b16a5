"""Config-file pipeline loading (core/config.py) — the reference's
a2b.yaml deployment shape (doc/usage/configuration.rst:10-49): named
URI endpoints, %param% substitution BEFORE driver validation,
dotted-path transforms, loud errors on typos and unknown names."""

import pytest

from a2b_spark.core.config import (
    load_transform,
    registry_from_config,
    registry_from_yaml,
)
from a2b_spark.core.drivers import BadUriException, NoDriverForSchemeException


def _base_cfg(sf_dir, tmp_path):
    return {
        "params": {"out_root": str(tmp_path)},
        "sources": [
            {
                "name": "regions_src",
                "uri": f"parquet://{sf_dir}/region.parquet",
            }
        ],
        "destinations": [
            {
                "name": "regions_out",
                "uri": "parquet://%out_root%/regions",
                "opts": {"key_cols": ["id"]},
            }
        ],
        "migrations": [
            {
                "name": "regions",
                "source": "regions_src",
                "destination": "regions_out",
                "source_ids": [{"name": "r_regionkey", "type": "int"}],
                "destination_ids": [{"name": "id", "type": "int"}],
                "transform": "examples.config_transforms:regions",
            }
        ],
    }


def test_config_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """Dict config → wired registry → real executor run: params
    substituted into URIs, named endpoints resolved by scheme,
    transform imported by dotted path."""
    from a2b_spark.exec.executor import run_migration
    from a2b_spark.mapping.store import MappingStore

    reg = registry_from_config(_base_cfg(sf_dir, tmp_path))
    m = reg.get("regions")
    assert m.destination.path == f"{tmp_path}/regions"  # %out_root% resolved
    run_migration(spark, m, MappingStore(spark, str(tmp_path / "maps")))
    out = m.destination.read_snapshot(spark)
    assert out.count() == 5
    assert {r.name for r in out.collect()} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }


def test_inline_uri_and_plain_id_names(spark, sf_dir, tmp_path):
    cfg = _base_cfg(sf_dir, tmp_path)
    mig = cfg["migrations"][0]
    mig["source"] = f"parquet://{sf_dir}/region.parquet"  # inline URI
    mig["source_ids"] = ["r_regionkey"]  # bare name = int id
    reg = registry_from_config(cfg)
    assert reg.get("regions").source_ids[0].type == "int"


def test_config_validation_is_loud(sf_dir, tmp_path):
    good = _base_cfg(sf_dir, tmp_path)

    cfg = dict(good, migrationz=[])  # top-level typo
    with pytest.raises(ValueError, match="unknown top-level"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["source_id"] = []  # migration-key typo
    with pytest.raises(ValueError, match="unknown keys.*source_id"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["source"] = "nope"  # unknown named endpoint
    with pytest.raises(ValueError, match="unknown source 'nope'"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["sources"][0]["uri"] = "gopher:///hole"  # resolution at LOAD time
    with pytest.raises(NoDriverForSchemeException):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["destinations"][0]["opts"] = {}  # missing required key_cols
    with pytest.raises(BadUriException, match="key_cols"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["params"] = {}  # %out_root% now unresolvable
    with pytest.raises(KeyError, match="out_root"):
        registry_from_config(cfg)


def test_inline_endpoint_validation(sf_dir, tmp_path):
    """Inline endpoint dicts get the SAME unknown-key contract as named
    entries: an 'opt:'/'key_col:' typo raises at load, it does not
    silently drop the options; and a bare 'stderr' SOURCE is an
    unknown-name error, not a confusing no-scheme BadUri (the driver
    registry maps bare stderr/stdout for destinations only)."""
    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["source"] = {
        "uri": f"parquet://{sf_dir}/region.parquet",
        "opt": {"schema": None},  # typo for opts
    }
    with pytest.raises(ValueError, match="unknown keys.*opt"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["destination"] = {
        "opts": {"key_cols": ["id"]}  # no uri at all
    }
    with pytest.raises(ValueError, match="needs uri"):
        registry_from_config(cfg)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["source"] = "stderr"
    with pytest.raises(ValueError, match="unknown source 'stderr'"):
        registry_from_config(cfg)

    # ...while the bare-name DESTINATION keeps resolving (simulate mode)
    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["destination"] = "stderr"
    reg = registry_from_config(cfg)
    assert type(reg.get("regions").destination).__name__ == "ConsoleDestination"


def test_config_driver_pin(sf_dir, tmp_path):
    """Explicit ``driver:`` on an endpoint resolves the
    UnclearDriverException ladder (annotation-field parity,
    src/Annotations/DataMigration.php:107-113): with two source
    drivers on the parquet scheme the unpinned config raises, the
    pinned one loads — on named entries and inline dicts alike — and
    a bogus pin is NonexistentDriverException."""
    from a2b_spark.core.drivers import (
        NonexistentDriverException,
        UnclearDriverException,
        _src_parquet,
        default_registry,
    )

    # a FRESH registry — mutating the _default() singleton would leak
    # the extra parquet driver into every later resolution
    drivers = default_registry()
    drivers.register("source", "parquet-alt", ("parquet",), _src_parquet)

    cfg = _base_cfg(sf_dir, tmp_path)
    with pytest.raises(UnclearDriverException, match="parquet"):
        registry_from_config(cfg, drivers)

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["sources"][0]["driver"] = "parquet-alt"  # named-entry pin
    reg = registry_from_config(cfg, drivers)
    assert reg.get("regions").source.path == f"{sf_dir}/region.parquet"

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["migrations"][0]["source"] = {  # inline-dict pin
        "uri": f"parquet://{sf_dir}/region.parquet",
        "driver": "parquet",
    }
    reg = registry_from_config(cfg, drivers)
    assert reg.get("regions").source.path == f"{sf_dir}/region.parquet"

    cfg = _base_cfg(sf_dir, tmp_path)
    cfg["sources"][0]["driver"] = "parquet-v9"
    with pytest.raises(NonexistentDriverException):
        registry_from_config(cfg, drivers)


def test_config_extends(spark, sf_dir, tmp_path):
    """``extends`` through the config file: the child shares the
    parent's mapping table when run for real (C10 semantics through
    the loader), id-shape mismatch and unknown parents raise at LOAD
    time — even when the child precedes its parent in the file."""
    from a2b_spark.exec.executor import run_migration
    from a2b_spark.mapping.store import MappingStore

    def with_child(child_overrides=None, child_first=False):
        cfg = _base_cfg(sf_dir, tmp_path)
        cfg["destinations"].append(
            {
                "name": "regions_out2",
                "uri": "parquet://%out_root%/regions2",
                "opts": {"key_cols": ["id"]},
            }
        )
        child = {
            "name": "regions_again",
            "source": "regions_src",
            "destination": "regions_out2",
            "source_ids": [{"name": "r_regionkey", "type": "int"}],
            "destination_ids": [{"name": "id", "type": "int"}],
            "transform": "examples.config_transforms:regions",
            "extends": "regions",
        }
        child.update(child_overrides or {})
        if child_first:
            cfg["migrations"].insert(0, child)
        else:
            cfg["migrations"].append(child)
        return cfg

    reg = registry_from_config(with_child(child_first=True))
    parent, child = reg.get("regions"), reg.get("regions_again")
    assert child.mapping_key() == "regions"
    store = MappingStore(spark, str(tmp_path / "maps"))
    run_migration(spark, parent, store)
    run_migration(spark, child, store)
    # one shared table, not two: every child row resolved through it
    assert (
        store.load("regions", parent.source_ids, parent.destination_ids)
        .count()
        == 5
    )
    import os

    assert not os.path.exists(store.path("regions_again"))
    assert child.destination.read_snapshot(spark).count() == 5

    with pytest.raises(ValueError, match="id definitions differ"):
        registry_from_config(
            with_child(
                {"source_ids": [{"name": "r_regionkey", "type": "string"}]}
            )
        )
    with pytest.raises(ValueError, match="extends unknown migration"):
        registry_from_config(with_child({"extends": "ghost"}))


def test_load_transform_errors():
    with pytest.raises(ValueError, match="dotted path"):
        load_transform("justaname")
    with pytest.raises(ModuleNotFoundError):
        load_transform("no.such.module:fn")
    with pytest.raises(ValueError, match="no attribute"):
        load_transform("examples.config_transforms:missing")
    with pytest.raises(ValueError, match="not callable"):
        load_transform("examples.config_transforms:F")  # a module object


def test_yaml_file_loads_and_runs(spark, tmp_path):
    """The committed examples/pipeline.yaml wires entirely from config
    and its regions migration runs for real."""
    from a2b_spark.exec.executor import run_migration
    from a2b_spark.mapping.store import MappingStore

    reg = registry_from_yaml("examples/pipeline.yaml")
    m = reg.get("regions")
    run_migration(spark, m, MappingStore(spark, str(tmp_path / "maps")))
    assert m.destination.read_snapshot(spark).count() == 5
    order = [x.name for x in reg.resolve_order(reg.select())]
    assert order.index("regions") < order.index("top_customers")
