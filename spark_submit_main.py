#!/usr/bin/env python3
"""spark-submit shim for the CDC engine.

Usage on a cluster (the package ships as a plain zip of pure-python files):

    cd <repo> && zip -qr /tmp/vds.zip vuln_datasync_spark
    spark-submit --master yarn --deploy-mode cluster \
        --py-files /tmp/vds.zip spark_submit_main.py \
        stream --changelog s3://bucket/changelog --table s3://bucket/lake/repo_files \
               --checkpoint s3://bucket/ckpt/repo_files --max-files-per-trigger 64

Locally: python spark_submit_main.py replay --changelog ... --table ...
"""

import sys

from vuln_datasync_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
