"""Search execution layer (field search, set ops, boosts, facets, results)."""

from .executor import search, search_to_result_with_doc, explain_plan  # noqa: F401
from .result import (  # noqa: F401
    DocWithHit,
    Hit,
    SearchResult,
    SearchResultWithDoc,
)
