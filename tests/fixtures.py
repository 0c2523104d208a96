"""Hand-built Kafka-shaped micro-batch rows + minimal FHIR bundles.

Modeled on the reference's fixture strategy
(/root/reference/tests/unit/test_bundle_processor.py:100-131 and
tests/unit/fixtures/resources/batches/put-and-delete/*): tiny bundles
engineered for the conflict-resolution truth table.
"""

from __future__ import annotations

import datetime as dt
import json

from fhir_to_lakehouse_spark.schemas import KAFKA_RECORD_SCHEMA as KAFKA_SCHEMA


def put_bundle(resource_type: str, rid: str, **fields) -> str:
    resource = {"resourceType": resource_type, "id": rid, **fields}
    return json.dumps(
        {
            "resourceType": "Bundle",
            "type": "transaction",
            "entry": [
                {
                    "resource": resource,
                    "request": {"method": "PUT", "url": f"{resource_type}/{rid}"},
                }
            ],
        }
    )


def delete_bundle(resource_type: str, rid: str) -> str:
    # DELETE entries carry no resource body (reference fixture
    # delete-single-patient.json)
    return json.dumps(
        {
            "resourceType": "Bundle",
            "type": "transaction",
            "entry": [
                {"request": {"method": "DELETE", "url": f"{resource_type}/{rid}"}}
            ],
        }
    )


def kafka_row(value: str, partition: int = 0, offset: int = 0, topic: str = "fhir"):
    return {
        "key": "k",
        "value": value,
        "timestamp": dt.datetime(2024, 1, 1),
        "partition": partition,
        "offset": offset,
        "topic": topic,
    }
