"""Golden-substring tests for the round-2 entity types — the reference's
remaining five (``/root/reference/src/core/pii_detector.py:31-37``:
ADDRESS, DATE_OF_Birth, IBAN_CODE, NHS, LOCATION), in the reference's
test style (tests/test_pipeline.py:26-43: token present, original
absent), plus checksum negative cases."""

from incident_pii_redactor_spark.core import scrub_document
from incident_pii_redactor_spark.core.detectors import iban_valid, nhs_valid


# --- IBAN (mod-97) ---------------------------------------------------------

def test_iban_redacted():
    out = scrub_document(
        "Wire funds to GB82WEST12345698765432 by Friday."
    ).text_scrubbed
    assert "[REDACTED_IBAN]" in out
    assert "GB82WEST12345698765432" not in out


def test_iban_checksum_rejects():
    assert iban_valid("GB82WEST12345698765432")
    assert not iban_valid("GB82WEST12345698765433")  # bad mod-97
    assert not iban_valid("GB82WEST123456987654")    # bad GB length
    out = scrub_document("code GB82WEST12345698765433 invalid").text_scrubbed
    assert "GB82WEST12345698765433" in out  # retained: checksum fails


def test_iban_german_shape():
    out = scrub_document("SEPA: DE89370400440532013000 ok").text_scrubbed
    assert "[REDACTED_IBAN]" in out and "DE89370400440532013000" not in out


# --- NHS (mod-11 check digit) ----------------------------------------------

def test_nhs_redacted():
    for form in ("943 476 5919", "943-476-5919", "9434765919"):
        out = scrub_document(f"Patient NHS {form} admitted.").text_scrubbed
        assert "[REDACTED_NHS]" in out, form
        assert form not in out


def test_nhs_check_digit_rejects():
    assert nhs_valid("9434765919")
    assert not nhs_valid("9434765918")
    # bare 10 digits (not phone-shaped, so only the NHS rule applies)
    out = scrub_document("ref 9434765918 here").text_scrubbed
    assert "9434765918" in out  # retained: check digit fails


# --- DATE_OF_BIRTH (context-gated dates) ------------------------------------

def test_dob_redacted_iso_and_slash():
    out = scrub_document("The patient was born on 1985-03-12.").text_scrubbed
    assert "[REDACTED_DOB]" in out and "1985-03-12" not in out
    out = scrub_document("DOB: 12/03/1985 on file.").text_scrubbed
    assert "[REDACTED_DOB]" in out and "12/03/1985" not in out


def test_dob_month_name_form():
    out = scrub_document(
        "Date of birth March 12, 1985 per the record."
    ).text_scrubbed
    assert "[REDACTED_DOB]" in out and "March 12, 1985" not in out


def test_plain_date_without_birth_context_retained():
    out = scrub_document("The deploy happened on 2024-06-01 at noon.").text_scrubbed
    assert "2024-06-01" in out  # no DOB cue -> not a birthdate


# --- ADDRESS (street pattern) -----------------------------------------------

def test_address_pseudonymized():
    out = scrub_document("Ship it to 123 Main Street before 5pm.").text_scrubbed
    assert "123 Main Street" not in out
    assert "Elm Street" in out  # deterministic fake street


def test_address_with_city_state_zip():
    addr = "456 Oak Avenue, Springfield, IL 62704"
    out = scrub_document(f"Office: {addr}.").text_scrubbed
    assert addr not in out
    assert "Elm Street" in out


def test_address_pseudonym_deterministic():
    a = scrub_document("At 123 Main Street.").text_scrubbed
    b = scrub_document("At 123 Main Street.").text_scrubbed
    assert a == b


# --- LOCATION (gazetteer) ----------------------------------------------------

def test_location_pseudonymized():
    out = scrub_document("The team met in Paris to review.").text_scrubbed
    assert "Paris" not in out
    assert "City_" in out


def test_location_multiword():
    out = scrub_document("Offices in New York and London closed.").text_scrubbed
    assert "New York" not in out and "London" not in out
    assert out.count("City_") == 2


def test_non_gazetteer_city_retained():
    out = scrub_document("The Smallville office is fine.").text_scrubbed
    assert "Smallville" in out
