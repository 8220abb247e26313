"""Side analyses: tree utilities (consensus, RF, random trees) and the
phylogenetic-diversity suite — the reference's auxiliary application
modes dispatched from main (/root/reference/pda.cpp:2394-2480)."""
