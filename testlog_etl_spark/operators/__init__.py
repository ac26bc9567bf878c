"""Query-clause operators: edge/domain dense-cube machinery and window
clauses (SURVEY SS2.5, SS2.6)."""
