ALTER TABLE customer ALTER COLUMN c_acctbal TYPE numeric(12,2);
