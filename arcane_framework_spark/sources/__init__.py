"""Sources (SURVEY.md §2.1): file change feeds, REST, blob listings, JDBC CDC."""

from arcane_framework_spark.sources.blob import blob_listing, blob_listing_stream  # noqa: F401
from arcane_framework_spark.sources.cdm import CdmChangeFeedSource  # noqa: F401
from arcane_framework_spark.sources.rest import RestApiSource  # noqa: F401
