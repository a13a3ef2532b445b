"""Run configuration (config.ini) parsing.

Mirrors the reference's ConfigParser-driven entry (reference:
rdfizer/rdfizer/semantify.py:9912-9947): datasets, output folder,
remove_duplicate, all_in_one_file, output_format, ordered, enrichment.
Flags that only exist to manage single-process memory (mapping_partitions,
ordered eviction scheduling, enrichment toggle) are accepted but are
no-ops here — Spark's shuffle/spill machinery replaces them.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field


@dataclass
class DatasetConfig:
    name: str
    mapping_path: str


@dataclass
class RunConfig:
    datasets: list[DatasetConfig] = field(default_factory=list)
    output_folder: str = "output"
    remove_duplicates: bool = True
    all_in_one_file: bool = False
    output_format: str = "n-triples"   # n-triples | turtle
    base: str | None = None
    infer_datatypes: bool = False
    input_dedup: bool = False
    # missing-attribute policy (reference: global ignore="yes",
    # semantify.py:75-76 + functions.py:1915-1920)
    missing_policy: str = "ignore"     # ignore | abort
    # CSV schema validation (reference valid_source, functions.py:41-50):
    # ragged rows abort the scan (FAILFAST) instead of silently degrading
    validate_csv: bool = False
    # grouped-gather item order: "value" (deterministic) or "source"
    # (reference source-row order, cc_functions.py:269-340)
    gather_row_order: str = "value"
    # triple dedup keying: "spog" (default), "spo" (collapse across
    # graphs), or "reference" (the reference's PTT keys — general
    # predicates scoped per object-map rule, graph ignored;
    # semantify.py:105-109 + 4651-4677)
    dedup_scope: str = "spog"
    # skip the global distinct for TriplesMaps proved duplicate-free
    # (unique subject key + distinct constant predicates); "no" forces
    # the distinct shuffle even when it provably removes nothing
    dedup_elision: bool = True


def load_config(path_or_dict) -> RunConfig:
    if isinstance(path_or_dict, dict):
        cp = configparser.ConfigParser()
        cp.read_dict(path_or_dict)
        base_dir = "."
    else:
        cp = configparser.ConfigParser(interpolation=configparser.ExtendedInterpolation())
        cp.read(path_or_dict)
        base_dir = os.path.dirname(os.path.abspath(path_or_dict))

    ds_sec = cp["datasets"]
    cfg = RunConfig(
        output_folder=ds_sec.get("output_folder", "output"),
        remove_duplicates=ds_sec.get("remove_duplicate", "yes").lower() in ("yes", "true"),
        all_in_one_file=ds_sec.get("all_in_one_file", "no").lower() in ("yes", "true"),
        output_format=ds_sec.get("output_format", "n-triples").lower(),
        infer_datatypes=ds_sec.get("infer_datatypes", "no").lower()
        in ("yes", "true"),
        input_dedup=ds_sec.get("input_dedup", "no").lower() in ("yes", "true"),
        missing_policy=("ignore" if ds_sec.get("ignore", "yes").lower()
                        in ("yes", "true") else "abort"),
        validate_csv=ds_sec.get("valid_source", "no").lower() in ("yes", "true"),
        gather_row_order=ds_sec.get("gather_row_order", "value").lower(),
        dedup_scope=ds_sec.get("dedup_scope", "spog").lower(),
        dedup_elision=ds_sec.get("dedup_elision", "yes").lower()
        in ("yes", "true"),
    )
    n = int(ds_sec.get("number_of_datasets", "1"))
    for i in range(1, n + 1):
        sec = cp[f"dataset{i}"]
        mp = sec["mapping"]
        if not os.path.isabs(mp):
            mp = os.path.join(base_dir, mp)
        cfg.datasets.append(DatasetConfig(name=sec.get("name", f"dataset{i}"), mapping_path=mp))
    return cfg
