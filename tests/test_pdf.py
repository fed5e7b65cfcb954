

def test_encrypted_pdf_is_error_value():
    import pytest

    from open_ocr_spark.kernels.dispatch import extract_document
    from open_ocr_spark.kernels.pdf_text import extract_pdf_text

    enc = (
        b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Encrypt 2 0 R >>\n%%EOF"
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(enc)
    text, status, err = extract_document(enc)
    assert text == "" and status == "error:pdf-unsupported"
    assert "encrypted" in err
