"""Registry segments — execution order is load-bearing; import
plans.registry (or any pNN, whose predecessor chain pulls the full
prefix) rather than cherry-picking."""
