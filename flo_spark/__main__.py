"""python -m flo_spark — flo-client-cli analog (see flo_spark/cli.py)."""

from flo_spark.cli import main

raise SystemExit(main())
