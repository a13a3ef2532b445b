"""CLI entry point — parity with ``python3 -m rdfizer -c config.ini``
(reference: rdfizer/rdfizer/__main__.py:31-47)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="sdm_rdfizer_spark",
        description="Materialize RDF knowledge graphs from RML mappings on Spark",
    )
    # --config_file is the reference CLI's long form (rdfizer __main__)
    ap.add_argument("-c", "--config", "--config_file", dest="config",
                    required=True, help="path to config.ini")
    ap.add_argument("--cpus", default="*",
                    help="local[...] core count for the default session")
    args = ap.parse_args()

    from .engine import default_session, semantify

    spark = default_session(cpus=args.cpus)
    results = semantify(args.config, spark)
    for name, df in results.items():
        print(f"dataset {name}: {df.count()} triples")


if __name__ == "__main__":
    main()
