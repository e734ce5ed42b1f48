"""Serving error taxonomy.

``ClientError`` marks a request the CLIENT got wrong (over-length source,
misshaped image features, malformed payload) — the HTTP layer maps it to
400. Everything else, including server-side ``ValueError``s from protocol
or worker bugs, stays a 500: classifying by a dedicated type instead of by
``ValueError`` keeps server bugs from being reported to clients (and to
monitoring) as their own malformed input.

Subclasses ``ValueError`` so pre-existing callers catching ``ValueError``
keep working. This module must stay jax-free (dispatcher processes import
it via the frontend).
"""


class ClientError(ValueError):
    pass
