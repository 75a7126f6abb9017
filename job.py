"""spark-submit application shim (north rule run shape):

    zip -qr pipeline.zip tabbyld_spark
    spark-submit --master <cluster> --py-files pipeline.zip job.py <command> ...

All logic lives in tabbyld_spark.jobs (shipped inside pipeline.zip)."""

import sys

from tabbyld_spark.jobs import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
