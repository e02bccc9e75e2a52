"""Flight factory demo — reference python/examples/flight_demo.py on Spark.

Spins up an in-process pyarrow Flight server (stand-in for a FlightSQL
endpoint) and scans it over real gRPC, one Spark partition per endpoint.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import threading

import pyarrow as pa
import pyarrow.flight as flight

from datafusion_table_providers_spark.factories import FlightTableFactory
from datafusion_table_providers_spark.session import get_spark


class DemoServer(flight.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.table = pa.table({"id": list(range(100)), "v": [i * 2.0 for i in range(100)]})

    def get_flight_info(self, context, descriptor):
        return flight.FlightInfo(
            self.table.schema,
            descriptor,
            [flight.FlightEndpoint(b"all", [])],
            -1,
            -1,
        )

    def do_get(self, context, ticket):
        return flight.RecordBatchStream(self.table)


def main():
    s = DemoServer()
    threading.Thread(target=s.serve, daemon=True).start()
    spark = get_spark("flight_demo")
    factory = FlightTableFactory().with_session(spark)
    df = factory.get_table(
        f"grpc://127.0.0.1:{s.port}", {"flight.sql.query": "SELECT * FROM demo"}
    )
    df.groupBy().sum("v").show()
    s.shutdown()


if __name__ == "__main__":
    main()
