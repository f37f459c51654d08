"""``python -m ethical_data_ingestion_spark <command>`` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
