from .inspect import assert_pushed_filters, explain_str, shuffle_count  # noqa: F401
