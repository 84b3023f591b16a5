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
