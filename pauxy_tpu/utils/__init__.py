"""Host-side utilities: I/O, option parsing, misc linear algebra."""
