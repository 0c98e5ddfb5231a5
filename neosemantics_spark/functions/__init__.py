from .scalar import (  # noqa: F401
    get_datatype,
    get_iri_local_name,
    get_iri_namespace,
    get_lang_tag,
    get_lang_value,
    get_value,
    has_lang_tag,
    is_iri,
    full_uri_from_short_form,
    short_form_from_full_uri,
    dt_check,
)
