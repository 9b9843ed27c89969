"""Explicit StructType contracts for every logical table.

The reference infers schemas implicitly via pandas (SURVEY.md §1.3);
we declare them, which makes reads strict, enables nested-schema
pruning, and removes the need for the downstream dtype re-validation
the reference performs (reference data_quality.py:142-166).

Citations point at the reference files that define each shape.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# fda_events — FDA adverse-event records, the transformer's input shape.
# Reference contract: tests/test_transformers.py:17-42,
# drug_transformer.py:92-136, data_quality.py:109-120.
# ---------------------------------------------------------------------------
FDA_EVENTS = T.StructType(
    [
        T.StructField("safetyreportid", T.StringType(), False),
        T.StructField("receivedate", T.DateType(), True),
        T.StructField("serious", T.IntegerType(), True),
        T.StructField("seriousnessdeath", T.IntegerType(), True),
        T.StructField("seriousnesshospitalization", T.IntegerType(), True),
        T.StructField("drug_name", T.StringType(), True),
        T.StructField("drug_indication", T.StringType(), True),
        T.StructField("reaction", T.StringType(), True),
        T.StructField("patient_age", T.DoubleType(), True),
        T.StructField("patient_sex", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# clinical_trials — flattened trial records (26-col extractor output;
# the minimal fixture columns the transforms exercise).
# Reference contract: clinicaltrials_extractor.py:147-200,
# tests/test_transformers.py:47-58, tests/test_enrichment.py:29-36.
# ---------------------------------------------------------------------------
CLINICAL_TRIALS = T.StructType(
    [
        T.StructField("nct_id", T.StringType(), False),
        T.StructField("brief_title", T.StringType(), True),
        T.StructField("overall_status", T.StringType(), True),
        T.StructField("phase", T.StringType(), True),
        T.StructField("enrollment_count", T.DoubleType(), True),
        T.StructField("conditions", T.StringType(), True),
        T.StructField("start_date", T.DateType(), True),
        T.StructField("completion_date", T.DateType(), True),
    ]
)

# ---------------------------------------------------------------------------
# fda_raw — nested Drugs@FDA record (extractor input).
# Reference contract: fda_extractor.py:125-176, tests/test_extractors.py:32-52.
# ---------------------------------------------------------------------------
FDA_RAW = T.StructType(
    [
        T.StructField("application_number", T.StringType(), True),
        T.StructField("sponsor_name", T.StringType(), True),
        T.StructField(
            "openfda",
            T.StructType(
                [
                    T.StructField("brand_name", T.ArrayType(T.StringType()), True),
                    T.StructField("generic_name", T.ArrayType(T.StringType()), True),
                    T.StructField(
                        "manufacturer_name", T.ArrayType(T.StringType()), True
                    ),
                ]
            ),
            True,
        ),
        T.StructField(
            "products",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("brand_name", T.StringType(), True),
                        T.StructField(
                            "active_ingredients",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("name", T.StringType(), True)]
                                )
                            ),
                            True,
                        ),
                        T.StructField("dosage_form", T.StringType(), True),
                        T.StructField("marketing_status", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "submissions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("submission_status_date", T.StringType(), True),
                        T.StructField("submission_type", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# ct_raw — nested ClinicalTrials.gov API v2 study (extractor input).
# Reference contract: clinicaltrials_extractor.py:112-220,
# tests/test_extractors.py:115-130.
# ---------------------------------------------------------------------------
def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, True)


_STR = T.StringType()

CT_RAW = _s(
    _f(
        "protocolSection",
        _s(
            _f(
                "identificationModule",
                _s(
                    _f("nctId", _STR),
                    _f("orgStudyIdInfo", _s(_f("id", _STR))),
                    _f("briefTitle", _STR),
                    _f("officialTitle", _STR),
                ),
            ),
            _f(
                "statusModule",
                _s(
                    _f("overallStatus", _STR),
                    _f("studyFirstPostDateStruct", _s(_f("date", _STR))),
                    _f("lastUpdatePostDateStruct", _s(_f("date", _STR))),
                    _f("startDateStruct", _s(_f("date", _STR))),
                    _f("completionDateStruct", _s(_f("date", _STR))),
                ),
            ),
            _f(
                "descriptionModule",
                _s(_f("briefSummary", _STR), _f("detailedDescription", _STR)),
            ),
            _f(
                "conditionsModule",
                _s(
                    _f("conditions", T.ArrayType(_STR)),
                    _f("keywords", T.ArrayType(_STR)),
                ),
            ),
            _f(
                "designModule",
                _s(
                    _f("studyType", _STR),
                    _f("phases", T.ArrayType(_STR)),
                    _f("enrollmentInfo", _s(_f("count", T.LongType()))),
                    _f(
                        "designInfo",
                        _s(
                            _f("allocation", _STR),
                            _f("interventionModel", _STR),
                            _f("primaryPurpose", _STR),
                            _f("masking", _s(_f("masking", _STR))),
                        ),
                    ),
                ),
            ),
            _f(
                "armsInterventionsModule",
                _s(_f("interventions", T.ArrayType(_s(_f("type", _STR))))),
            ),
            _f(
                "outcomesModule",
                _s(_f("primaryOutcomes", T.ArrayType(_s(_f("measure", _STR))))),
            ),
            _f(
                "eligibilityModule",
                _s(
                    _f("sex", _STR),
                    _f("minimumAge", _STR),
                    _f("maximumAge", _STR),
                    _f("healthyVolunteers", T.BooleanType()),
                ),
            ),
            _f(
                "contactsLocationsModule",
                _s(_f("locations", T.ArrayType(_s(_f("country", _STR))))),
            ),
            _f(
                "sponsorCollaboratorsModule",
                _s(_f("leadSponsor", _s(_f("name", _STR)))),
            ),
        ),
    )
)

# ---------------------------------------------------------------------------
# enriched — pipeline output (oracle target).
# Reference contract: drug_transformer.py:196-288.
# ---------------------------------------------------------------------------
ENRICHED = T.StructType(
    [
        T.StructField("drug_name", T.StringType(), True),
        T.StructField("adverse_event_count", T.LongType(), True),
        T.StructField("avg_severity_score", T.DoubleType(), True),
        T.StructField("death_count", T.LongType(), True),
        T.StructField("hospitalization_count", T.LongType(), True),
        T.StructField("trial_count", T.LongType(), True),
        T.StructField("total_enrollment", T.DoubleType(), True),
        T.StructField("completed_trials", T.LongType(), True),
    ]
)

# CT-only fallback shape (drug_transformer.py:223-228,284-285).
CT_SUMMARY = T.StructType(
    [
        T.StructField("condition", T.StringType(), True),
        T.StructField("trial_count", T.LongType(), True),
        T.StructField("total_enrollment", T.DoubleType(), True),
        T.StructField("completed_trials", T.LongType(), True),
    ]
)
