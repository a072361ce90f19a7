"""Deterministic arXiv-shaped fixtures (FIXTURES.md §B) for pipeline
unit tests — built inline, no files, seedless (pure literals)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def arxiv_raw(spark: SparkSession) -> DataFrame:
    """Bronze rows exercising the FIXTURES.md edge-case checklist."""
    rows = [
        # normal row, dup + unmapped categories, messy comments
        dict(
            id="0704.0001", submitter="s1", authors="Alice A, Bob B",
            title="T1", comments="a\n b\r\n  c", doi="10.1/x1",
            categories="cs.AI cs.AI weird.cat", license=None,
            abstract="ab", update_date="Mon, 2 Apr 2007 19:18:42 GMT",
            versions=[{"created": "Mon, 2 Apr 2007 19:18:42 GMT", "version": "v1"},
                      {"created": "bogus date", "version": "v2"}],
            authors_parsed=[["A", "Alice", ""], ["B", "Bob", ""]],
        ),
        # null authors → []
        dict(
            id="0704.0002", submitter="s2", authors=None, title="T2",
            comments=None, doi="10.1/x2", categories="math.CO",
            license="cc", abstract="ab",
            update_date="not parseable", versions=[], authors_parsed=[],
        ),
        # dropped by scan predicate: doi null
        dict(
            id="0704.0003", submitter="s3", authors="Carol C", title="T3",
            comments="x", doi=None, categories="cs.LG", license=None,
            abstract="ab", update_date="Tue, 24 Jul 2007 20:10:27 GMT",
            versions=[], authors_parsed=[],
        ),
    ]
    for r in rows:
        r.setdefault("journal-ref", None)
        r.setdefault("report-no", None)
    schema = (
        "id string, submitter string, authors string, title string, "
        "comments string, `journal-ref` string, doi string, `report-no` string, "
        "categories string, license string, abstract string, "
        "versions array<struct<created:string,version:string>>, "
        "update_date string, authors_parsed array<array<string>>"
    )
    return spark.createDataFrame(rows, schema)


def enriched(spark: SparkSession) -> DataFrame:
    """Silver-3-shaped rows (post-enrichment) for star/graph tests.
    Includes: shared author across papers (J4 collisions), two authors
    on same paper, ISSN pairs, references, versions."""
    rows = [
        dict(
            id="k1", arxiv="0704.0001", doi="10.1/x1", title="P1",
            submitter="s1", journal_ref="J1 (2007)", general_categories="Computer Science",
            referenceCount=2, score=5, citationCount=10,
            influentialCitationCount=1,
            publisher="Pub A", journal_name="J. One",
            article_number="a1", type="journal-article", issue="1",
            language="en", short_container_title="JO",
            container_title="Journal One", is_referenced_by_count=10,
            license_start=None, license_url="http://l/1",
            license_content_version="vor", license_delay=0,
            deposited=None,
            ISSN_type=[{"value": "1111-1111", "type": "print"}],
            references=[{"DOI": "10.1/r1", "key": "r1", "doi_asserted_by": "pub"},
                        {"DOI": "10.1/r2", "key": "r2", "doi_asserted_by": "cr"}],
            versions=[{"created": "Mon, 2 Apr 2007 19:18:42 GMT", "version": "v1"}],
            s2_authors_data=[{"name": "Alice A", "affiliations": ["Uni X"]},
                             {"name": "Bob B", "affiliations": []}],
        ),
        dict(
            id="k2", arxiv="0704.0002", doi="10.1/x2", title="P2",
            submitter="s2", journal_ref="Unknown", general_categories="Mathematics",
            referenceCount=0, score=3, citationCount=2,
            influentialCitationCount=0,
            publisher="Pub A", journal_name=None,
            article_number=None, type="journal-article", issue=None,
            language="en", short_container_title=None,
            container_title=None, is_referenced_by_count=2,
            license_start=None, license_url=None,
            license_content_version=None, license_delay=None,
            deposited=None,
            ISSN_type=[], references=[], versions=[],
            s2_authors_data=[{"name": "Alice A", "affiliations": ["Uni X"]},
                             {"name": "Dana D", "affiliations": ["Uni Y"]}],
        ),
    ]
    schema = (
        "id string, arxiv string, doi string, title string, submitter string, journal_ref string, "
        "general_categories string, referenceCount int, score int, "
        "citationCount int, influentialCitationCount int, publisher string, "
        "journal_name string, article_number string, type string, issue string, "
        "language string, short_container_title string, container_title string, "
        "is_referenced_by_count int, license_start timestamp, license_url string, "
        "license_content_version string, license_delay int, deposited timestamp, "
        "ISSN_type array<struct<value:string,type:string>>, "
        "references array<struct<DOI:string,key:string,doi_asserted_by:string>>, "
        "versions array<struct<created:string,version:string>>, "
        "s2_authors_data array<struct<name:string,affiliations:array<string>>>"
    )
    return spark.createDataFrame(rows, schema)
