"""Source/sink configuration: Kafka mapping, parquet/CSV/JSON readers.

The Kafka live path maps the reference's consumer-driver machinery
(beavers/kafka.py) onto Structured Streaming options — offset policies,
batch admission, serde — rather than re-implementing a consumer loop.
"""

from beavers_spark.sources.kafka import (  # noqa: F401
    KafkaSinkConfig,
    KafkaSourceConfig,
    OffsetPolicy,
    kafka_reader,
    kafka_writer,
)
from beavers_spark.sources.kafka_driver import (  # noqa: F401
    KafkaDagDriver,
    SinkTopicBinding,
    SourceTopicBinding,
)
from beavers_spark.sources.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from beavers_spark.sources.layout import (  # noqa: F401
    column_bounds,
    file_span_report,
    write_zordered,
    zorder_key,
)
from beavers_spark.sources.files import (  # noqa: F401
    read_csv_source,
    read_json_source,
    read_parquet_source,
)
