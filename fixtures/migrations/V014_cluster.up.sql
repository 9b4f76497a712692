CLUSTER users USING idx_users_email;
