"""``python -m crowdmod_tpu.cli <subcommand>`` — same dispatch as the
``crowdmod`` console script (crowdmod_tpu/cli/__init__.py)."""

from crowdmod_tpu.cli import main

raise SystemExit(main())
