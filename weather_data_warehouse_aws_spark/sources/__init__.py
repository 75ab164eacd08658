from .tables import TABLES, load_table, register_views  # noqa: F401
from .feed_source import (  # noqa: F401
    WeatherFeedDataSource,
    register_feed_source,
)
