"""Native C++ host runtime: TEXMEX IO and the k-way result merger."""
