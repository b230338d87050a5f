"""Sources: the custom AMQP streaming DataSource and its transports.

Register with ``register_amqp_source(spark)``; then::

    spark.readStream.format("amqp").option("address", "temperature").load()
"""

from streaming_amqp_spark.sources.amqp import (  # noqa: F401
    AMQPDataSource,
    register_amqp_source,
)
