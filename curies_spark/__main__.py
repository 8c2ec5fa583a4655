"""``python -m curies_spark`` → the CLI group (reference __main__.py
launches its click CLI the same way): ``resolver`` / ``mapper`` serve
the web apps, ``construct`` runs the KG construction Spark job
(plans/submit_job.py)."""

from .cli import main

if __name__ == "__main__":
    main()
