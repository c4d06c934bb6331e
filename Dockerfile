# Container for the PySpark approximate query engine HTTP service.
FROM apache/spark-py:v4.0.0

USER root
WORKDIR /app

COPY approximate_query_engine_spark/ /app/approximate_query_engine_spark/
COPY bench.py __spark_entry__.py /app/

RUN pip install --no-cache-dir flask pandas pyarrow numpy

ENV PYTHONPATH=/app \
    AQE_PORT=8080 \
    SPARK_GRAFT_CPUS=4

EXPOSE 8080
CMD ["python", "-m", "approximate_query_engine_spark.api"]
