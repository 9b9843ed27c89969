"""Flatten transforms: nested raw API records -> flat tables.

Pure nested-schema SELECTs reproducing the reference extractors'
parse functions (P1-P10 in SURVEY.md §2.2) with higher-order array
functions — the row-wise Python dict-walking of the reference becomes
JVM-side expressions, so flattening 100 TB of raw JSON is a single
map stage with full column pruning.

fda: reference src/extractors/fda_extractor.py:125-176
ct:  reference src/extractors/clinicaltrials_extractor.py:112-237
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _join_arr(col: Column, sep: str = ", ") -> Column:
    """', '.join(arr) with null -> '' (reference default)."""
    return F.coalesce(F.array_join(col, sep), F.lit(""))


def flatten_fda(raw: DataFrame) -> DataFrame:
    """fda_raw -> 11-column fda_flat (fda_extractor.py:125-176).

    * openfda arrays joined with ', ' (P2)
    * first product's fields (P3), active-ingredient names joined (P4)
    * latest submission by status date via comparator array_sort +
      first element — the argmax without explode or shuffle (P5/T1).
      The reference stable-sorts by date ONLY (fda_extractor.py:160,
      list.sort reverse=True) and takes the first entry, so among
      equal dates the EARLIEST-LISTED submission wins — replicated by
      carrying the original index as the tiebreak (sorting (d, t)
      tuples instead would pick the max TYPE on date ties).
    * yyyyMMdd parse with coerce-to-null (P6)
    """
    first_product = F.element_at("products", 1)
    idx_subs = F.transform(
        "submissions",
        # two-arg lambda = (element, index) by the HOF protocol
        lambda s, i: F.struct(
            F.coalesce(s["submission_status_date"], F.lit("")).alias("d"),
            i.alias("idx"),
            s["submission_type"].alias("t"),
        ),
    )
    latest_sub = F.element_at(
        F.array_sort(
            idx_subs,
            lambda l, r: F.when(l["d"] > r["d"], F.lit(-1))
            .when(l["d"] < r["d"], F.lit(1))
            .otherwise(l["idx"] - r["idx"])
            .cast("int"),
        ),
        1,
    )
    return raw.select(
        F.col("application_number"),
        F.col("sponsor_name"),
        _join_arr(F.col("openfda.brand_name")).alias("openfda_brand_name"),
        _join_arr(F.col("openfda.generic_name")).alias("openfda_generic_name"),
        _join_arr(F.col("openfda.manufacturer_name")).alias(
            "openfda_manufacturer_name"
        ),
        F.coalesce(first_product["brand_name"], F.lit("")).alias("brand_name"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.coalesce(
                        first_product["active_ingredients"],
                        F.array().cast("array<struct<name:string>>"),
                    ),
                    lambda i: i["name"],
                ),
                ", ",
            ),
            F.lit(""),
        ).alias("active_ingredients"),
        F.coalesce(first_product["dosage_form"], F.lit("")).alias("dosage_form"),
        F.coalesce(first_product["marketing_status"], F.lit("")).alias(
            "marketing_status"
        ),
        F.to_date(latest_sub["d"], "yyyyMMdd").alias("latest_submission_date"),
        F.coalesce(latest_sub["t"], F.lit("")).alias("submission_type"),
    )


def flatten_ct(raw: DataFrame) -> DataFrame:
    """ct_raw -> 26-column ct_flat (clinicaltrials_extractor.py:147-237).

    * module field access with '' defaults (P7)
    * intervention types: distinct non-empty, joined (P8)
    * top-3 outcome measures joined with ' | ' (P9)
    * enrollment cast with coerce (P10); ISO dates with coerce
    """
    p = F.col("protocolSection")
    ident = p["identificationModule"]
    status = p["statusModule"]
    desc = p["descriptionModule"]
    conds = p["conditionsModule"]
    design = p["designModule"]
    arms = p["armsInterventionsModule"]
    outcomes = p["outcomesModule"]
    elig = p["eligibilityModule"]
    locs = p["contactsLocationsModule"]
    sponsor = p["sponsorCollaboratorsModule"]

    def s(col: Column) -> Column:
        return F.coalesce(col, F.lit(""))

    return raw.select(
        s(ident["nctId"]).alias("nct_id"),
        s(ident["orgStudyIdInfo"]["id"]).alias("org_study_id"),
        s(ident["briefTitle"]).alias("brief_title"),
        s(ident["officialTitle"]).alias("official_title"),
        s(status["overallStatus"]).alias("overall_status"),
        F.to_date(status["studyFirstPostDateStruct"]["date"]).alias(
            "study_first_post_date"
        ),
        F.to_date(status["lastUpdatePostDateStruct"]["date"]).alias(
            "last_update_post_date"
        ),
        F.to_date(status["startDateStruct"]["date"]).alias("start_date"),
        F.to_date(status["completionDateStruct"]["date"]).alias("completion_date"),
        s(desc["briefSummary"]).alias("brief_summary"),
        s(desc["detailedDescription"]).alias("detailed_description"),
        _join_arr(conds["conditions"]).alias("conditions"),
        _join_arr(conds["keywords"]).alias("keywords"),
        s(design["studyType"]).alias("study_type"),
        _join_arr(design["phases"]).alias("phase"),
        design["enrollmentInfo"]["count"].cast("double").alias("enrollment_count"),
        s(design["designInfo"]["allocation"]).alias("allocation"),
        s(design["designInfo"]["interventionModel"]).alias("intervention_model"),
        s(design["designInfo"]["primaryPurpose"]).alias("primary_purpose"),
        s(design["designInfo"]["masking"]["masking"]).alias("masking"),
        F.array_join(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.coalesce(
                            arms["interventions"],
                            F.array().cast("array<struct<type:string>>"),
                        ),
                        lambda i: F.coalesce(i["type"], F.lit("")),
                    ),
                    lambda t: t != "",
                )
            ),
            ", ",
        ).alias("intervention_types"),
        F.array_join(
            # reference order: slice top-3 FIRST, then drop empties
            # (clinicaltrials_extractor.py:234-235 outcomes[:3] then
            # filter(None)) — filtering before the slice could admit a
            # 4th outcome, and skipping the filter joins '' elements in
            F.filter(
                F.slice(
                    F.transform(
                        F.coalesce(
                            outcomes["primaryOutcomes"],
                            F.array().cast("array<struct<measure:string>>"),
                        ),
                        lambda o: F.coalesce(o["measure"], F.lit("")),
                    ),
                    1,
                    3,
                ),
                lambda m: m != "",
            ),
            " | ",
        ).alias("primary_outcome_measures"),
        s(elig["sex"]).alias("gender"),
        s(elig["minimumAge"]).alias("min_age"),
        s(elig["maximumAge"]).alias("max_age"),
        F.coalesce(elig["healthyVolunteers"], F.lit(False)).alias("accepts_healthy"),
        _join_arr(
            # one entry PER LOCATION SITE, duplicates and '' preserved
            # (clinicaltrials_extractor.py:192-194 joins the raw
            # per-site list) — a distinct here would erase the
            # site-count signal and diverge from the reference
            F.transform(
                F.coalesce(
                    locs["locations"],
                    F.array().cast("array<struct<country:string>>"),
                ),
                lambda l: F.coalesce(l["country"], F.lit("")),
            )
        ).alias("location_countries"),
        s(sponsor["leadSponsor"]["name"]).alias("lead_sponsor"),
    )
