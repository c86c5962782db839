def html_to_otsl(*args, **kwargs):
    raise NotImplementedError(
        "otsl conversion is not exercised by the differential tests"
    )
