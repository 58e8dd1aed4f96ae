"""spark-submit shim: `spark-submit --py-files engine.zip cli_shim.py <cmd> ...`
(spark-submit takes a script path; python -m works everywhere else)."""

import sys

from dart_xbrl_crawler_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
