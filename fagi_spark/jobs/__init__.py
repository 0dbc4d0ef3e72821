"""spark-submit entrypoints (ship with ``--py-files fagi_spark.zip``).

Each job is a thin CLI over the library: parse args -> build the
DataFrame plan -> checkpoint-commit the output. The full chained
pipeline (ingest -> discover -> fuse -> tiles) with resume lives in
``pipeline.py``; it is the runnable analog of the reference CLI flow
(FusionGISCLI: import -> link -> fuse -> export, SURVEY.md §3.1).
"""
