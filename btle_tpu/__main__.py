"""Module entry point: ``python -m btle_tpu <subcommand> ...``.

Mirrors the reference app's module invocation surface
(host/python/btle_cli/src/btle_cli/__main__.py:1) — the full CLI lives in
btle_tpu.cli.app; this shim makes the package itself invocable.
"""

from .cli.app import main

raise SystemExit(main())
