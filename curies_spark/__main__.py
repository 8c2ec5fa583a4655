"""``python -m curies_spark`` → the KG-construction job entrypoint
(reference __main__.py launches its CLI the same way; the engine's
"CLI" is the spark-submit job, plans/submit_job.py)."""

import sys

from .plans.submit_job import main

if __name__ == "__main__":
    sys.exit(main())
