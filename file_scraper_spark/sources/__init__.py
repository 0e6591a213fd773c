from file_scraper_spark.sources.dispatch import source_for_path  # noqa: F401
