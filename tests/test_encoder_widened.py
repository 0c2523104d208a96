"""Round-4 encoder widening: every resource type a Synthea population
emits gets curated typed columns (schemas.py RESOURCE_SCHEMAS), so no
resource in the reference's own e2e corpus degrades to the id+JSON
generic fallback. One representative nested-field assertion per type;
the lossless resource_json column is asserted to survive alongside."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import (
    encode_resources,
    resolve_references,
)
from fhir_to_lakehouse_spark.schemas import RESOURCE_SCHEMAS

# (resource_type, resource_dict, probe(row) -> asserted-true)
CASES = [
    (
        "AllergyIntolerance",
        {
            "id": "a1",
            "criticality": "high",
            "category": ["food"],
            "code": {"text": "peanut"},
            "patient": {"reference": "Patient/1"},
            "reaction": [
                {"manifestation": [{"text": "hives"}], "severity": "moderate"}
            ],
        },
        lambda r: r.reaction[0].manifestation[0].text == "hives"
        and r.criticality == "high"
        and r.category == ["food"],
    ),
    (
        "CarePlan",
        {
            "id": "cp1",
            "status": "active",
            "intent": "order",
            "period": {"start": "2024-01-01", "end": "2024-06-01"},
            "activity": [{"detail": {"code": {"text": "diet"}, "status": "in-progress"}}],
        },
        lambda r: r.activity[0].detail.code.text == "diet"
        and r.period.start == "2024-01-01",
    ),
    (
        "CareTeam",
        {
            "id": "ct1",
            "status": "active",
            "participant": [
                {"role": [{"text": "doctor"}], "member": {"reference": "Practitioner/9"}}
            ],
        },
        # encode_resources normalizes Type/<id> references to the bare id
        lambda r: r.participant[0].member.reference == "9",
    ),
    (
        "Claim",
        {
            "id": "c1",
            "status": "active",
            "patient": {"reference": "Patient/1"},
            "item": [
                {"sequence": 1, "net": {"value": 90.25, "currency": "USD"}},
                {"sequence": 2, "net": {"value": 9.75, "currency": "USD"}},
            ],
            "total": {"value": 100.00, "currency": "USD"},
        },
        lambda r: float(r.item[0].net.value) == 90.25
        and float(r.total.value) == 100.0,
    ),
    (
        "ExplanationOfBenefit",
        {
            "id": "e1",
            "status": "active",
            "outcome": "complete",
            "total": [
                {"category": {"text": "submitted"}, "amount": {"value": 55.5, "currency": "USD"}}
            ],
            "payment": {"amount": {"value": 44.4, "currency": "USD"}},
        },
        lambda r: float(r.total[0].amount.value) == 55.5
        and float(r.payment.amount.value) == 44.4,
    ),
    (
        "Organization",
        {
            "id": "o1",
            "active": True,
            "name": "General Hospital",
            "address": [{"city": "Boston", "state": "MA"}],
        },
        lambda r: r.name == "General Hospital" and r.address[0].city == "Boston",
    ),
    (
        "Practitioner",
        {
            "id": "p1",
            "name": [{"family": "Who", "given": ["Jo"], "prefix": ["Dr."]}],
            "gender": "other",
        },
        lambda r: r.name[0].family == "Who" and r.name[0].prefix == ["Dr."],
    ),
    (
        "DocumentReference",
        {
            "id": "d1",
            "status": "current",
            "content": [
                {"attachment": {"contentType": "text/plain", "data": "aGk="}}
            ],
            "context": {"encounter": [{"reference": "Encounter/5"}]},
        },
        lambda r: r.content[0].attachment.contentType == "text/plain"
        and r.context.encounter[0].reference == "5",
    ),
    (
        "Goal",
        {
            "id": "g1",
            "lifecycleStatus": "active",
            "description": {"text": "lose weight"},
            "target": [
                {"detailQuantity": {"value": 70.0, "unit": "kg"}, "dueDate": "2025-01-01"}
            ],
        },
        lambda r: r.target[0].detailQuantity.unit == "kg"
        and r.lifecycleStatus == "active",
    ),
    (
        "MedicationAdministration",
        {
            "id": "m1",
            "status": "completed",
            "medicationCodeableConcept": {"text": "insulin"},
            "dosage": {"dose": {"value": 10.0, "unit": "IU"}, "route": {"text": "subcut"}},
        },
        lambda r: r.dosage.dose.unit == "IU"
        and r.medicationCodeableConcept.text == "insulin",
    ),
    (
        "Device",
        {
            "id": "dev1",
            "status": "active",
            "distinctIdentifier": "SN-001",
            "deviceName": [{"name": "pacemaker", "type": "user-friendly-name"}],
        },
        lambda r: r.deviceName[0].name == "pacemaker"
        and r.distinctIdentifier == "SN-001",
    ),
    (
        "ImagingStudy",
        {
            "id": "i1",
            "status": "available",
            "numberOfSeries": 2,
            "series": [
                {
                    "uid": "1.2.3",
                    "number": 1,
                    "modality": {"system": "DICOM", "code": "CT"},
                    "numberOfInstances": 40,
                    "bodySite": {"text": "chest"},
                }
            ],
        },
        lambda r: r.series[0].modality.code == "CT"
        and r.series[0].numberOfInstances == 40,
    ),
    (
        "SupplyDelivery",
        {
            "id": "s1",
            "status": "completed",
            "suppliedItem": {
                "quantity": {"value": 3.0},
                "itemCodeableConcept": {"text": "gauze"},
            },
        },
        lambda r: r.suppliedItem.itemCodeableConcept.text == "gauze",
    ),
    # --- round-5 widening: common non-Synthea R4 admin/workflow types
    (
        "Location",
        {
            "id": "l1",
            "status": "active",
            "name": "Ward 3B",
            "mode": "instance",
            "position": {"longitude": -71.06, "latitude": 42.36},
            "managingOrganization": {"reference": "Organization/o1"},
        },
        lambda r: r.name == "Ward 3B"
        and abs(r.position.latitude - 42.36) < 1e-9
        and r.managingOrganization.reference == "o1",
    ),
    (
        "Medication",
        {
            "id": "med1",
            "status": "active",
            "code": {"text": "amoxicillin"},
            "ingredient": [
                {
                    "itemCodeableConcept": {"text": "amoxicillin trihydrate"},
                    "isActive": True,
                    "strength": {
                        "numerator": {"value": 500.0, "unit": "mg"},
                        "denominator": {"value": 1.0, "unit": "tablet"},
                    },
                }
            ],
        },
        lambda r: r.ingredient[0].strength.numerator.unit == "mg"
        and float(r.ingredient[0].strength.numerator.value) == 500.0,
    ),
    (
        "Coverage",
        {
            "id": "cov1",
            "status": "active",
            "beneficiary": {"reference": "Patient/1"},
            "payor": [{"reference": "Organization/ins1"}],
            "class": [
                {"type": {"text": "group"}, "value": "G-77", "name": "Acme"}
            ],
        },
        lambda r: r.beneficiary.reference == "1"
        and r.payor[0].reference == "ins1"
        and getattr(r, "class")[0].value == "G-77",
    ),
    (
        "Provenance",
        {
            "id": "prov1",
            "target": [{"reference": "urn:uuid:obs-9"}],
            "recorded": "2024-03-01T12:00:00Z",
            "agent": [
                {
                    "type": {"text": "author"},
                    "who": {"reference": "Practitioner/p7"},
                }
            ],
        },
        lambda r: r.target[0].reference == "obs-9"
        and r.agent[0].who.reference == "p7",
    ),
    (
        "RelatedPerson",
        {
            "id": "rp1",
            "active": True,
            "patient": {"reference": "Patient/1"},
            "relationship": [{"text": "mother"}],
            "name": [{"family": "Doe", "given": ["Jane"]}],
            "gender": "female",
        },
        lambda r: r.patient.reference == "1"
        and r.relationship[0].text == "mother"
        and r.name[0].given == ["Jane"],
    ),
    (
        "ServiceRequest",
        {
            "id": "sr1",
            "status": "active",
            "intent": "order",
            "priority": "routine",
            "code": {"text": "MRI knee"},
            "subject": {"reference": "Patient/1"},
            "requester": {"reference": "Practitioner/p2"},
            "reasonReference": [{"reference": "Condition/c3"}],
        },
        lambda r: r.code.text == "MRI knee"
        and r.requester.reference == "p2"
        and r.reasonReference[0].reference == "c3",
    ),
    (
        "Specimen",
        {
            "id": "sp1",
            "status": "available",
            "type": {"text": "venous blood"},
            "subject": {"reference": "Patient/1"},
            "collection": {
                "collector": {"reference": "Practitioner/p3"},
                "collectedDateTime": "2024-05-05T08:00:00Z",
                "quantity": {"value": 5.0, "unit": "mL"},
            },
        },
        lambda r: r.collection.quantity.unit == "mL"
        and r.collection.collector.reference == "p3",
    ),
    (
        "Appointment",
        {
            "id": "ap1",
            "status": "booked",
            "description": "follow-up",
            "start": "2024-06-01T09:00:00Z",
            "minutesDuration": 30,
            "participant": [
                {"actor": {"reference": "Patient/1"}, "status": "accepted"},
                {
                    "actor": {"reference": "Practitioner/p4"},
                    "status": "accepted",
                },
            ],
        },
        lambda r: r.minutesDuration == 30
        and [p.actor.reference for p in r.participant] == ["1", "p4"],
    ),
    (
        "PractitionerRole",
        {
            "id": "pr1",
            "active": True,
            "practitioner": {"reference": "Practitioner/p5"},
            "organization": {"reference": "Organization/o2"},
            "specialty": [{"text": "cardiology"}],
            "location": [{"reference": "Location/l1"}],
        },
        lambda r: r.practitioner.reference == "p5"
        and r.specialty[0].text == "cardiology"
        and r.location[0].reference == "l1",
    ),
    (
        "QuestionnaireResponse",
        {
            "id": "qr1",
            "status": "completed",
            "questionnaire": "Questionnaire/phq-9",
            "subject": {"reference": "Patient/1"},
            "authored": "2024-07-01T10:00:00Z",
            "item": [
                {
                    "linkId": "q1",
                    "text": "feeling down?",
                    "answer": [{"valueBoolean": True}],
                },
                {
                    "linkId": "q2",
                    "text": "score",
                    "answer": [{"valueDecimal": 7.5}],
                },
            ],
        },
        lambda r: r.item[0].answer[0].valueBoolean is True
        and float(r.item[1].answer[0].valueDecimal) == 7.5
        and r.subject.reference == "1",
    ),
    # --- round-5 widening, batch 2: document/workflow/admin types
    (
        "Composition",
        {
            "id": "comp1",
            "status": "final",
            "type": {"text": "discharge summary"},
            "subject": {"reference": "Patient/1"},
            "title": "Discharge",
            "author": [{"reference": "Practitioner/p1"}],
            "section": [
                {
                    "title": "meds",
                    "entry": [{"reference": "MedicationRequest/m1"}],
                }
            ],
        },
        lambda r: r.title == "Discharge"
        and r.author[0].reference == "p1"
        and r.section[0].entry[0].reference == "m1",
    ),
    (
        "Consent",
        {
            "id": "con1",
            "status": "active",
            "scope": {"text": "patient-privacy"},
            "patient": {"reference": "Patient/1"},
            "provision": {
                "type": "permit",
                "period": {"start": "2024-01-01", "end": "2025-01-01"},
            },
        },
        lambda r: r.provision.type == "permit"
        and r.provision.period.start == "2024-01-01"
        and r.patient.reference == "1",
    ),
    (
        "Communication",
        {
            "id": "comm1",
            "status": "completed",
            "subject": {"reference": "Patient/1"},
            "sender": {"reference": "Practitioner/p2"},
            "recipient": [{"reference": "urn:uuid:rp-1"}],
            "payload": [{"contentString": "lab results ready"}],
        },
        lambda r: r.payload[0].contentString == "lab results ready"
        and r.recipient[0].reference == "rp-1",
    ),
    (
        "Task",
        {
            "id": "t1",
            "status": "requested",
            "intent": "order",
            "priority": "urgent",
            "description": "review labs",
            "for": {"reference": "Patient/1"},
            "owner": {"reference": "PractitionerRole/pr1"},
        },
        lambda r: r.description == "review labs"
        and getattr(r, "for").reference == "1"
        and r.owner.reference == "pr1",
    ),
    (
        "NutritionOrder",
        {
            "id": "n1",
            "status": "active",
            "intent": "order",
            "patient": {"reference": "Patient/1"},
            "oralDiet": {
                "type": [{"text": "low sodium"}],
                "nutrient": [
                    {
                        "modifier": {"text": "sodium"},
                        "amount": {"value": 2.0, "unit": "g"},
                    }
                ],
            },
        },
        lambda r: r.oralDiet.nutrient[0].modifier.text == "sodium"
        and float(r.oralDiet.nutrient[0].amount.value) == 2.0,
    ),
    (
        "Flag",
        {
            "id": "f1",
            "status": "active",
            "code": {"text": "fall risk"},
            "subject": {"reference": "Patient/1"},
            "period": {"start": "2024-02-02"},
        },
        lambda r: r.code.text == "fall risk" and r.period.start == "2024-02-02",
    ),
    (
        "List",
        {
            "id": "li1",
            "status": "current",
            "mode": "working",
            "title": "problem list",
            "subject": {"reference": "Patient/1"},
            "entry": [
                {"deleted": False, "item": {"reference": "Condition/c1"}}
            ],
        },
        lambda r: r.title == "problem list"
        and r.entry[0].item.reference == "c1"
        and r.entry[0].deleted is False,
    ),
    (
        "Schedule",
        {
            "id": "sch1",
            "active": True,
            "actor": [{"reference": "PractitionerRole/pr1"}],
            "planningHorizon": {"start": "2024-06-01", "end": "2024-07-01"},
        },
        lambda r: r.actor[0].reference == "pr1"
        and r.planningHorizon.end == "2024-07-01",
    ),
    (
        "Slot",
        {
            "id": "sl1",
            "status": "free",
            "schedule": {"reference": "Schedule/sch1"},
            "start": "2024-06-02T09:00:00Z",
            "end": "2024-06-02T09:30:00Z",
            "overbooked": False,
        },
        lambda r: r.schedule.reference == "sch1" and r.overbooked is False,
    ),
    (
        "Media",
        {
            "id": "med1",
            "status": "completed",
            "type": {"text": "photo"},
            "subject": {"reference": "Patient/1"},
            "content": {
                "contentType": "image/jpeg",
                "title": "wound photo",
                "size": 2048,
            },
            "height": 480,
            "width": 640,
        },
        lambda r: r.content.contentType == "image/jpeg"
        and r.width == 640
        and r.subject.reference == "1",
    ),
    # --- round-7 tranche: pharmacy / workflow / risk / billing chain ---
    (
        "MedicationDispense",
        {
            "id": "md1",
            "status": "completed",
            "medicationCodeableConcept": {"text": "amoxicillin 500mg"},
            "subject": {"reference": "Patient/1"},
            "performer": [{"actor": {"reference": "Practitioner/9"}}],
            "authorizingPrescription": [{"reference": "MedicationRequest/rx7"}],
            "quantity": {"value": 30, "unit": "tablets"},
            "daysSupply": {"value": 10, "unit": "d"},
            "whenHandedOver": "2024-03-01T12:00:00Z",
        },
        lambda r: float(r.quantity.value) == 30.0
        and float(r.daysSupply.value) == 10.0
        and r.performer[0].actor.reference == "9"
        and r.authorizingPrescription[0].reference == "rx7",
    ),
    (
        "MedicationStatement",
        {
            "id": "ms1",
            "status": "active",
            "medicationCodeableConcept": {"text": "lisinopril"},
            "subject": {"reference": "Patient/1"},
            "effectivePeriod": {"start": "2024-01-01", "end": "2024-12-31"},
            "reasonCode": [{"text": "hypertension"}],
        },
        lambda r: r.effectivePeriod.end == "2024-12-31"
        and r.reasonCode[0].text == "hypertension",
    ),
    (
        "EpisodeOfCare",
        {
            "id": "eoc1",
            "status": "active",
            "statusHistory": [
                {"status": "planned", "period": {"start": "2024-01-01", "end": "2024-02-01"}},
                {"status": "active", "period": {"start": "2024-02-01"}},
            ],
            "patient": {"reference": "Patient/1"},
            "managingOrganization": {"reference": "Organization/o1"},
            "careManager": {"reference": "Practitioner/9"},
        },
        lambda r: r.statusHistory[0].status == "planned"
        and r.statusHistory[1].period.start == "2024-02-01"
        and r.managingOrganization.reference == "o1",
    ),
    (
        "FamilyMemberHistory",
        {
            "id": "fmh1",
            "status": "completed",
            "patient": {"reference": "Patient/1"},
            "relationship": {"text": "mother"},
            "bornDate": "1950-04-02",
            "condition": [
                {
                    "code": {"text": "diabetes"},
                    "onsetAge": {"value": 52, "unit": "a"},
                    "contributedToDeath": False,
                }
            ],
        },
        lambda r: str(r.bornDate) == "1950-04-02"
        and r.condition[0].code.text == "diabetes"
        and float(r.condition[0].onsetAge.value) == 52.0,
    ),
    (
        "ClinicalImpression",
        {
            "id": "ci1",
            "status": "completed",
            "subject": {"reference": "Patient/1"},
            "summary": "stable",
            "finding": [
                {
                    "itemCodeableConcept": {"text": "anemia"},
                    "itemReference": {"reference": "Condition/c3"},
                    "basis": "lab panel",
                }
            ],
        },
        lambda r: r.finding[0].itemCodeableConcept.text == "anemia"
        and r.finding[0].itemReference.reference == "c3",
    ),
    (
        "DeviceRequest",
        {
            "id": "dr1",
            "status": "active",
            "intent": "order",
            "codeReference": {"reference": "Device/d4"},
            "subject": {"reference": "Patient/1"},
            "requester": {"reference": "Practitioner/9"},
            "authoredOn": "2024-05-05T00:00:00Z",
        },
        lambda r: r.codeReference.reference == "d4" and r.intent == "order",
    ),
    (
        "DeviceUseStatement",
        {
            "id": "dus1",
            "status": "active",
            "subject": {"reference": "Patient/1"},
            "device": {"reference": "Device/d4"},
            "timingPeriod": {"start": "2024-05-06"},
            "recordedOn": "2024-05-07T00:00:00Z",
        },
        lambda r: r.device.reference == "d4"
        and r.timingPeriod.start == "2024-05-06",
    ),
    (
        "CommunicationRequest",
        {
            "id": "cr1",
            "status": "active",
            "priority": "urgent",
            "subject": {"reference": "Patient/1"},
            "recipient": [{"reference": "Practitioner/9"}, {"reference": "CareTeam/ct1"}],
            "payload": [{"contentString": "please call back"}],
        },
        lambda r: r.priority == "urgent"
        and [x.reference for x in r.recipient] == ["9", "ct1"]
        and r.payload[0].contentString == "please call back",
    ),
    (
        "RiskAssessment",
        {
            "id": "ra1",
            "status": "final",
            "subject": {"reference": "Patient/1"},
            "condition": {"reference": "Condition/c3"},
            "prediction": [
                {
                    "outcome": {"text": "stroke"},
                    "probabilityDecimal": 0.125,
                    "qualitativeRisk": {"text": "low"},
                }
            ],
            "mitigation": "statin therapy",
        },
        lambda r: float(r.prediction[0].probabilityDecimal) == 0.125
        and r.prediction[0].qualitativeRisk.text == "low"
        and r.condition.reference == "c3",
    ),
    (
        "Account",
        {
            "id": "acct1",
            "status": "active",
            "type": {"text": "patient billing"},
            "name": "ACME billing",
            "subject": [{"reference": "Patient/1"}],
            "servicePeriod": {"start": "2024-01-01", "end": "2024-12-31"},
            "owner": {"reference": "Organization/o1"},
        },
        lambda r: r.subject[0].reference == "1"
        and r.servicePeriod.end == "2024-12-31"
        and r.owner.reference == "o1",
    ),
    (
        "Invoice",
        {
            "id": "inv1",
            "status": "issued",
            "subject": {"reference": "Patient/1"},
            "recipient": {"reference": "Organization/o1"},
            "date": "2024-06-01T00:00:00Z",
            "lineItem": [
                {"sequence": 1, "chargeItemReference": {"reference": "ChargeItem/chg1"}}
            ],
            "totalNet": {"value": 99.5, "currency": "USD"},
            "totalGross": {"value": 109.45, "currency": "USD"},
        },
        lambda r: float(r.totalNet.value) == 99.5
        and float(r.totalGross.value) == 109.45
        and r.lineItem[0].chargeItemReference.reference == "chg1",
    ),
    (
        "ChargeItem",
        {
            "id": "chg1",
            "status": "billable",
            "code": {"text": "venipuncture"},
            "subject": {"reference": "Patient/1"},
            "quantity": {"value": 2},
            "priceOverride": {"value": 12.34, "currency": "USD"},
            "performingOrganization": {"reference": "Organization/o1"},
        },
        lambda r: float(r.quantity.value) == 2.0
        and float(r.priceOverride.value) == 12.34,
    ),
    (
        "AdverseEvent",
        {
            "id": "ae1",
            "actuality": "actual",
            "event": {"text": "fall"},
            "subject": {"reference": "Patient/1"},
            "severity": {"text": "mild"},
            "suspectEntity": [{"instance": {"reference": "Medication/m2"}}],
        },
        lambda r: r.actuality == "actual"
        and r.suspectEntity[0].instance.reference == "m2",
    ),
    (
        "VisionPrescription",
        {
            "id": "vp1",
            "status": "active",
            "patient": {"reference": "Patient/1"},
            "prescriber": {"reference": "Practitioner/9"},
            "dateWritten": "2024-04-04T00:00:00Z",
            "lensSpecification": [
                {"product": {"text": "lens"}, "eye": "right", "sphere": -2.25, "add": 1.75}
            ],
        },
        lambda r: r.lensSpecification[0].eye == "right"
        and float(r.lensSpecification[0].sphere) == -2.25
        and float(r.lensSpecification[0]["add"]) == 1.75,
    ),
    (
        "Group",
        {
            "id": "g1",
            "type": "person",
            "actual": True,
            "name": "diabetes cohort",
            "quantity": 2,
            "managingEntity": {"reference": "Organization/o1"},
            "member": [
                {"entity": {"reference": "Patient/1"}, "inactive": False},
                {"entity": {"reference": "Patient/2"}, "inactive": True},
            ],
        },
        lambda r: r.actual is True
        and [m.entity.reference for m in r.member] == ["1", "2"]
        and r.member[1].inactive is True,
    ),
    (
        "HealthcareService",
        {
            "id": "hs1",
            "active": True,
            "providedBy": {"reference": "Organization/o1"},
            "type": [{"text": "cardiology"}],
            "name": "cardio clinic",
            "location": [{"reference": "Location/l1"}],
            "telecom": [{"system": "phone", "value": "555-0100"}],
        },
        lambda r: r.type[0].text == "cardiology"
        and r.location[0].reference == "l1"
        and r.telecom[0].value == "555-0100",
    ),
    (
        "Endpoint",
        {
            "id": "ep1",
            "status": "active",
            "connectionType": {
                "system": "http://terminology.hl7.org/CodeSystem/endpoint-connection-type",
                "code": "hl7-fhir-rest",
            },
            "name": "fhir api",
            "managingOrganization": {"reference": "Organization/o1"},
            "payloadType": [{"text": "any"}],
            "address": "https://fhir.example.org/r4",
        },
        lambda r: r.connectionType.code == "hl7-fhir-rest"
        and r.address == "https://fhir.example.org/r4",
    ),
    (
        "Basic",
        {
            "id": "b1",
            "code": {"text": "referral note"},
            "subject": {"reference": "Patient/1"},
            "created": "2024-02-02",
            "author": {"reference": "Practitioner/9"},
        },
        lambda r: r.code.text == "referral note"
        and str(r.created) == "2024-02-02"
        and r.author.reference == "9",
    ),
]


def test_synthea_working_set_is_fully_curated():
    """Every resource type Synthea emits must have a curated schema —
    additions to the generator's output should fail here first."""
    synthea = {
        "Patient", "Encounter", "Condition", "Observation", "Procedure",
        "Immunization", "MedicationRequest", "DiagnosticReport",
        "AllergyIntolerance", "CarePlan", "CareTeam", "Claim",
        "ExplanationOfBenefit", "Organization", "Practitioner",
        "DocumentReference", "Goal", "MedicationAdministration",
        "Device", "ImagingStudy", "SupplyDelivery",
    }
    assert synthea <= set(RESOURCE_SCHEMAS)


@pytest.mark.parametrize(
    "rtype,resource,probe", CASES, ids=[c[0] for c in CASES]
)
def test_curated_type_decodes_nested_fields(spark, rtype, resource, probe):
    resource = {"resourceType": rtype, **resource}
    df = spark.createDataFrame(
        [(json.dumps(resource),)], "resource string"
    )
    # probes that read references expect the resolved (bare-id) form —
    # exercised through the query-time resolve_references transform
    # over a storage-parity (verbatim) encode
    row = resolve_references(encode_resources(df, rtype), rtype).collect()[0]
    assert row.id == resource["id"]
    assert probe(row), f"{rtype} nested decode failed: {row}"
    # lossless raw column always rides along
    assert json.loads(row.resource_json) == resource


@pytest.mark.parametrize(
    "rtype,resource,probe", CASES, ids=[c[0] for c in CASES]
)
def test_curated_schemas_tolerate_extra_fields(spark, rtype, resource, probe):
    """Fields outside the curated schema (FHIR extensions, meta) must
    not break parsing — from_json in default PERMISSIVE mode ignores
    them, and they remain queryable via resource_json."""
    resource = {
        "resourceType": rtype,
        **resource,
        "meta": {"profile": ["http://example.org/StructureDefinition/x"]},
        "extension": [{"url": "http://example.org/ext", "valueString": "x"}],
    }
    df = spark.createDataFrame([(json.dumps(resource),)], "resource string")
    # the catalog probes run through the full query-time path: a
    # storage-parity encode (verbatim references) + resolve_references,
    # so reference-expecting probes exercise the read-side transform
    row = resolve_references(encode_resources(df, rtype), rtype).collect()[0]
    assert row.id == resource["id"]
    assert probe(row)


# --- reference normalization (VERDICT r4 item 5) ----------------------


def test_normalize_references_prefix_forms(spark):
    """urn:uuid: and Type/ prefixes resolve to the bare id, with the
    stripped type preserved in Reference.type (FHIR's own element);
    absolute URLs, conditional references, and versioned references
    are untouched; NULL Reference structs stay NULL (not
    struct(NULL)); an explicit Reference.type in the document wins."""
    import json

    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    def obs(oid, ref, rtype=None):
        subject = None
        if ref is not None:
            subject = {"reference": ref}
            if rtype is not None:
                subject["type"] = rtype
        d = {"resourceType": "Observation", "id": oid, "status": "final"}
        if subject is not None:
            d["subject"] = subject
        return json.dumps(d)

    rows = [
        (obs("a", "urn:uuid:pat-1"),),
        (obs("b", "Patient/pat-2"),),
        (obs("c", "https://example.org/fhir/Patient/pat-3"),),
        (obs("d", "Patient?identifier=mrn|123"),),
        (obs("e", None),),
        (obs("f", "Patient/123/_history/2"),),  # versioned: untouched
        (obs("g", "Group/pat-2", rtype="Group"),),  # explicit type wins
    ]
    df = spark.createDataFrame(rows, "resource string")
    got = {
        r["id"]: (
            (r["subject"]["reference"], r["subject"]["type"])
            if r["subject"] is not None
            else None
        )
        for r in resolve_references(
            encode_resources(df, "Observation"), "Observation"
        ).collect()
    }
    assert got["a"] == ("pat-1", None)  # urn uuid: globally unique
    assert got["b"] == ("pat-2", "Patient")  # type preserved
    assert got["c"] == ("https://example.org/fhir/Patient/pat-3", None)
    assert got["d"] == ("Patient?identifier=mrn|123", None)
    assert got["e"] is None  # null struct preserved as null
    assert got["f"] == ("Patient/123/_history/2", None)  # not half-stripped
    assert got["g"] == ("pat-2", "Group")


def test_normalized_references_cannot_false_join_across_types(spark):
    """FHIR ids are unique only per type: after normalization,
    'Patient/5' and 'Group/5' share the bare id but their type fields
    differ — the type guard keeps an id-join from attaching a Group
    reference to Patient 5 (the round-5 code-review false-join
    scenario)."""
    import json

    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    def obs(oid, ref):
        return json.dumps(
            {
                "resourceType": "Observation",
                "id": oid,
                "status": "final",
                "subject": {"reference": ref},
            }
        )

    df = spark.createDataFrame(
        [(obs("o1", "Patient/5"),), (obs("o2", "Group/5"),)],
        "resource string",
    )
    enc = resolve_references(
        encode_resources(df, "Observation"), "Observation"
    )
    guarded = enc.filter(
        F.col("subject.type").isNull() | (F.col("subject.type") == "Patient")
    )
    assert [r["id"] for r in guarded.collect()] == ["o1"]
    # both normalize to the same bare id — the type column is what
    # disambiguates
    assert {r["subject"]["reference"] for r in enc.collect()} == {"5"}


def test_normalize_references_inside_arrays(spark):
    """Reference structs nested in arrays (e.g. reasonReference) are
    rewritten element-wise by resolve_references; the default encode
    keeps the raw form (storage parity) and encode-time normalization
    is an explicit opt-in."""
    import json

    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    doc = json.dumps(
        {
            "resourceType": "MedicationRequest",
            "id": "m1",
            "status": "active",
            "intent": "order",
            "subject": {"reference": "urn:uuid:p9"},
            "reasonReference": [
                {"reference": "Condition/c1"},
                {"reference": "urn:uuid:c2"},
            ],
        }
    )
    df = spark.createDataFrame([(doc,)], "resource string")
    enc = resolve_references(
        encode_resources(df, "MedicationRequest"), "MedicationRequest"
    ).collect()[0]
    assert enc["subject"]["reference"] == "p9"
    assert [x["reference"] for x in enc["reasonReference"]] == ["c1", "c2"]
    # the DEFAULT encode stores the verbatim strings (Pathling storage
    # parity, ADVICE r5) ...
    raw = encode_resources(df, "MedicationRequest").collect()[0]
    assert raw["subject"]["reference"] == "urn:uuid:p9"
    assert [x["reference"] for x in raw["reasonReference"]] == [
        "Condition/c1",
        "urn:uuid:c2",
    ]
    # ... and encode-time normalization remains an explicit opt-in for
    # pipelines that version their table format that way
    opt = encode_resources(
        df, "MedicationRequest", normalize_refs=True
    ).collect()[0]
    assert opt["subject"]["reference"] == "p9"


def test_explode_entries_carries_full_url(spark):
    import json

    from fhir_to_lakehouse_spark.operators.bundles import prepare_stream
    from tests.fixtures import KAFKA_SCHEMA, kafka_row

    bundle = json.dumps(
        {
            "resourceType": "Bundle",
            "type": "transaction",
            "entry": [
                {
                    "fullUrl": "urn:uuid:abc",
                    "resource": json.dumps({"resourceType": "Patient"}),
                    "request": {"method": "PUT", "url": "Patient/abc"},
                }
            ],
        }
    )
    df = prepare_stream(
        spark.createDataFrame([kafka_row(bundle)], KAFKA_SCHEMA)
    )
    row = df.collect()[0]
    assert row["full_url"] == "urn:uuid:abc"
