#!/usr/bin/env python
"""spark-submit entry point for the swspark CLI.

``spark-submit`` takes a script path, not a ``-m`` module flag, so
cluster launches go through this thin wrapper::

    spark-submit --py-files swspark.zip run_swspark.py crawl ...

Argument semantics are identical to ``python -m swspark`` (see
swspark/__main__.py).
"""

import sys

from swspark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
